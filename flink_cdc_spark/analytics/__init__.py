"""Classic OLAP analytics over the TPC-H-shaped tables — the ad-hoc
query surface of the engine (joins, filtered aggregates, top-k), each
gated by a DuckDB oracle."""
