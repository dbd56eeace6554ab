"""XLA building-block ops shared by models and pipelines."""
