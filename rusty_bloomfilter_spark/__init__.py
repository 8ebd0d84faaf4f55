"""rusty_bloomfilter_spark — a from-scratch PySpark-native distributed
sketch / approximate-aggregation library.

Semantics derive from the public reference
`Claude-at-Instaclustr/rusty_bloomfilter` (Bloom filter algebra; see
SURVEY.md) re-expressed Spark-first: DataFrame plans, vectorized
pandas/Arrow UDFs over numpy kernels, explicit tree-merge topology,
checkpointable per-partition state.
"""

from .sketch import BloomFilter, CountingBloomFilter, CountMinSketch, HyperLogLog, KLLSketch, Shape

__version__ = "0.1.0"

__all__ = ["BloomFilter", "CountingBloomFilter", "CountMinSketch", "HyperLogLog", "KLLSketch", "Shape", "__version__"]
