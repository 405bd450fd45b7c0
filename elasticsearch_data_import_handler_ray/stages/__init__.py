"""map_batches stages: text analysis, dedup, ANN, multimodal plumbing."""
