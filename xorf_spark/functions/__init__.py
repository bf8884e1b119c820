from .registry import md5long, register_sql_udfs  # noqa: F401
