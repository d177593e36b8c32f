from lotus_spark.sources.connectors import load_from_db, load_from_s3, load_files
from lotus_spark.sources.web_search import (
    engines,
    register_engine,
    web_extract,
    web_search,
)

__all__ = [
    "load_from_db",
    "load_from_s3",
    "load_files",
    "web_search",
    "web_extract",
    "register_engine",
    "engines",
]
