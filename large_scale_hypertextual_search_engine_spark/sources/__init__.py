"""Sources: corpus loaders/generators, CORD-19-style extractor, readers."""
