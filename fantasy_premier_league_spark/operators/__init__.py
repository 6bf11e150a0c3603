"""Custom operators the reference needs that Spark lacks as single calls.

Each is a composition of DataFrame ops where semantics allow (as-of join,
dedup, exact similarity), dropping to Arrow-batched pandas only where the
computation is genuinely non-relational (fuzzy string scoring, multimodal
decode).
"""
