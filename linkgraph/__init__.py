"""linkgraph — a PySpark-native link-graph analytics engine.

Built from scratch on the DataFrame API (Catalyst-optimized), with the
partitioning semantics of scuChenscu/GraphPartitioners (see SURVEY.md):

- edge partitioners: hash/round-robin (reference ``algorithms/rand``),
  DBH (``algorithms/dbh``), HDRF-style greedy (``algorithms/hdrf``),
  2D-grid (published PowerGraph/GraphBuilder semantics), plus salted
  high-degree splitting for skew;
- partition-quality metrics matching the reference definitions
  (``partitioner/edgePartitioner.cpp:30-46``);
- Pregel-style analytics: PageRank, connected components (hash-min),
  label propagation, triangle counting — expressed as DataFrame joins
  and vectorized Arrow UDFs over per-partition CSR blocks;
- checkpointed, resumable superstep loops with per-partition lineage
  counters;
- training-data pipeline operators: dedup (exact/MinHash/SimHash),
  similarity search, text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"
