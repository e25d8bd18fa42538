"""Data sources: synthetic pages table, HTML text extraction, WARC
archives, multimodal, input-contract quality."""

from gopie_spark.sources.pages import (extract_text, extract_text_series,
                                       generate_pages, pages_schema,
                                       with_extracted_text)
from gopie_spark.sources.quality import (input_quality_aggs,
                                         quarantine_reason,
                                         quarantine_to_dir,
                                         split_quarantine)
from gopie_spark.sources.warc import (parse_warc, read_warc,
                                      stream_warc, warc_schema,
                                      write_warc_file)

__all__ = ["extract_text", "extract_text_series", "generate_pages",
           "pages_schema", "with_extracted_text",
           "input_quality_aggs", "quarantine_reason", "quarantine_to_dir",
           "split_quarantine",
           "parse_warc", "read_warc", "stream_warc", "warc_schema",
           "write_warc_file"]
