from .tables import iceberg_available, load_table  # noqa: F401
from .jsonl import read_documents_jsonl  # noqa: F401
from .token_table import docs_tokens, tokens_from_documents  # noqa: F401
