"""placeholder — populated in a later milestone."""
