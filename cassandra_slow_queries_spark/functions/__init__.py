"""Pure-expression scalar function library (no Python UDFs on the hot path)."""
