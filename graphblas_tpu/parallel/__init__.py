from .dist import (DistMatrix, dist_bfs_levels, dist_mxm, dist_mxv,
                   dist_pagerank, dist_reduce_scalar, dist_vxm,
                   load_sharded, make_mesh, save_sharded)
