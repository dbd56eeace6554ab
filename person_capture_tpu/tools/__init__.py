"""Offline tools: weight conversion, checkpoint IO."""
