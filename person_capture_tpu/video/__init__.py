"""Host-side video IO: readers, probing, keyframe index, synthetic fixtures."""
