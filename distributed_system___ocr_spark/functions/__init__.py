"""Column-level helpers: bloom filters, vector math, text stats."""
