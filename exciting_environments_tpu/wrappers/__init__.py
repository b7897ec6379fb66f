"""User-facing wrappers (Gymnasium-style, MuJoCo-MJX)."""
