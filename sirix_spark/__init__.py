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


def __getattr__(name):
    # lazy: keep `import sirix_spark` light for executors
    if name == "Sirix":
        from sirix_spark.api import Sirix

        return Sirix
    if name == "VersionedStore":
        from sirix_spark.store import VersionedStore

        return VersionedStore
    raise AttributeError(name)


__all__ = ["get_spark", "Sirix", "VersionedStore"]
__version__ = "0.1.0"
