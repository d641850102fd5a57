"""sirix_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of sirixdb/sirix (reference studied at
/root/reference, see SURVEY.md).

Architecture (SURVEY.md §7): everything is declarative DataFrame/SQL so
Catalyst + Tungsten pick the physical strategy; the custom layer lives
*above* Spark (versioned snapshot store, temporal operator family,
diff serialization) plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from sirix_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
