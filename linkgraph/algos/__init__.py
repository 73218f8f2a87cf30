from linkgraph.algos.pagerank import pagerank  # noqa: F401
from linkgraph.algos.cc import connected_components  # noqa: F401
from linkgraph.algos.lpa import label_propagation  # noqa: F401
from linkgraph.algos.triangles import triangle_counts  # noqa: F401
