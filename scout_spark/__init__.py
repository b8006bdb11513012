"""scout_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jollyboss123/scout (forward geocoding via
two-phase filter-then-verify similarity search), generalized to a
large-scale training-data pipeline toolkit (dedup, similarity search,
text analysis, streaming).

Design stance (SURVEY.md §7): public PySpark DataFrame/SQL API only; plans
are declared declaratively so Catalyst handles pushdown/pruning/join
selection; Python crosses into executors only through Arrow-vectorized
pandas UDFs, and only where built-in functions genuinely can't express the
semantics (rapidfuzz-style fuzzy scoring, simhash bit-voting).
"""

__version__ = "0.1.0"
