"""HDR→SDR still export pipeline and validation oracles."""
