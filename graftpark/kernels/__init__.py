from graftpark.kernels.pagerank import pagerank  # noqa: F401
from graftpark.kernels.components import (  # noqa: F401
    connected_components,
    connected_components_twophase,
)
from graftpark.kernels.labelprop import label_propagation  # noqa: F401
from graftpark.kernels.bfs import bfs_parents  # noqa: F401
from graftpark.kernels.coloring import mis_coloring, greedy_coloring  # noqa: F401
from graftpark.kernels.triangles import triangle_count  # noqa: F401
