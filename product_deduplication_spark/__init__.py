"""product_deduplication_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine with the capability surface of the reference
pandas pipeline at ``/root/reference`` (oportusgonzalo/product-deduplication).

Not a port: the reference's TF-IDF + sparse-cosine candidate generation
(``reference/static.py:58-85``) is replaced by k-shingle MinHash + LSH banding
and SimHash Hamming neighborhoods; its greedy sequential group merge
(``reference/static.py:127-175``) is replaced by large-star/small-star
connected components; its per-row ``df.apply`` fuzzy verification
(``reference/static.py:203-215``) is replaced by JVM-side exact-Jaccard set
ops plus vectorized Arrow UDFs. See SURVEY.md for the operator-by-operator
mapping.
"""

__version__ = "0.1.0"

from product_deduplication_spark.config import DedupConfig
from product_deduplication_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark", "__version__"]
