from .token_table import docs_tokens, tokens_from_documents  # noqa: F401
