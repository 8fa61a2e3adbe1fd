from riot_spark.sources.corpus import (
    extract_text,
    generate_pages,
    load_documents,
    pages_to_documents,
)

__all__ = [
    "extract_text",
    "generate_pages",
    "load_documents",
    "pages_to_documents",
]
