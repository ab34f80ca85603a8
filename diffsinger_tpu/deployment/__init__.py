"""diffsinger_tpu deployment package."""
