from octopusdb_spark.sources.io import read_table, write_table
from octopusdb_spark.sources.warc import (
    encode_warc,
    parse_warc,
    read_warc,
    read_warc_dir,
)

__all__ = [
    "read_table",
    "write_table",
    "encode_warc",
    "parse_warc",
    "read_warc",
    "read_warc_dir",
]
