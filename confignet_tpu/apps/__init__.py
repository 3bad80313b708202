"""Command-line entry points (same flags and outputs as the reference's six
CLI scripts, SURVEY.md §2.6)."""
