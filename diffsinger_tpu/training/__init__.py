"""diffsinger_tpu training package."""
