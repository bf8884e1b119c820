from .registry import (  # noqa: F401
    md5long,
    register_sketch_udfs,
    register_sql_udfs,
    shingle_hashes_sql,
    shingle_starts_sql,
    word_shingles_sql,
)
