from .dist import (DistMatrix, dist_bfs_levels, dist_mxv, dist_pagerank,
                   dist_reduce_scalar, dist_vxm, make_mesh)
