"""diffsinger_tpu data package."""
