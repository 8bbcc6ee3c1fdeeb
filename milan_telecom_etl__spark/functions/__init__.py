"""User-defined function surface. Policy: the hot path is built-in
expressions only (SURVEY.md §2.10 — every reference UDF was eliminated
into column algebra); this package holds the sanctioned EXTENSION
points: Python UDTFs (table-generating) and Arrow-batched kernels for
logic Spark genuinely cannot express."""
