"""Data sources: synthetic pages table, HTML text extraction, multimodal."""

from gopie_spark.sources.pages import (extract_text, extract_text_series,
                                       generate_pages, pages_schema,
                                       with_extracted_text)

__all__ = ["extract_text", "extract_text_series", "generate_pages",
           "pages_schema", "with_extracted_text"]
