"""Cross-cutting relational utilities (skew handling, plan helpers)."""
