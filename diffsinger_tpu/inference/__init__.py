"""diffsinger_tpu inference package."""
