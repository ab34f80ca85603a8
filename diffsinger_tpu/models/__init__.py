"""diffsinger_tpu models package."""
