"""End-to-end query plans registered with the driver harness."""
