from graftpark.kernels.pagerank import pagerank  # noqa: F401
from graftpark.kernels.components import connected_components  # noqa: F401
from graftpark.kernels.labelprop import label_propagation  # noqa: F401
from graftpark.kernels.bfs import bfs_parents  # noqa: F401
from graftpark.kernels.coloring import mis_coloring, greedy_coloring  # noqa: F401
from graftpark.kernels.triangles import triangle_count  # noqa: F401
