from octopusdb_spark.service.server import KVService
from octopusdb_spark.service.client import KVClient

__all__ = ["KVService", "KVClient"]
