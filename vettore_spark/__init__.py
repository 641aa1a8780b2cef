"""vettore_spark — a PySpark-native vector analytics engine.

Re-implements the query and data-processing capabilities of the reference
vector database (elchemista/vettore, studied at /root/reference) as idiomatic
Spark DataFrame operators, plus the large-scale training-data pipeline surface
(dedup, ANN, text analysis, multimodal plumbing) the single-node reference
cannot reach.
"""

from vettore_spark.functions import kernels
from vettore_spark.collection import Collection, CollectionConfig
from vettore_spark.session import ENGINE_SESSION_DEFAULTS, with_engine_defaults

__all__ = [
    "kernels",
    "Collection",
    "CollectionConfig",
    "ENGINE_SESSION_DEFAULTS",
    "with_engine_defaults",
]
__version__ = "0.1.0"
