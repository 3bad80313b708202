"""Core utilities: config handling, PRNG threading, image conventions,
3D transforms and model IO."""
