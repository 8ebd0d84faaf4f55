"""JVM-side column expression builders (Catalyst-codegen'd, no Python).

The tokenizer is *cross-engine reproducible*: the same token ids are
computable in Spark SQL and in DuckDB (for driver-contract oracles),
via md5 — both engines implement the identical published digest. The
hot path for production-scale hashing of strings is `F.xxhash64`
(JVM-side); md5-tokenization exists so exact SQL oracles can pin the
token pipeline end to end.
"""

from .text import (
    DUCKDB_TOKENIZE,
    duckdb_lang_id,
    lang_id_expr,
    quality_exprs,
    token_count_expr,
    tokenize_md5,
    tokenize_xxhash,
)

__all__ = [
    "DUCKDB_TOKENIZE",
    "duckdb_lang_id",
    "lang_id_expr",
    "quality_exprs",
    "token_count_expr",
    "tokenize_md5",
    "tokenize_xxhash",
]
