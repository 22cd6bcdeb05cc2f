"""LLM-data-pipeline operators (north-star extensions): text analysis,
deduplication, vector similarity search, multimodal column plumbing.

All hot paths are JVM-side column expressions (split/transform/filter/
aggregate lambdas, md5, bit ops); Python appears only in clearly-marked
Pandas-UDF paths (multimodal decode stubs, SimHash packing).
"""
