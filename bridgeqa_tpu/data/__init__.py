"""Data layer: dataset config, ScanQA pipeline, augmentation, vocab."""
