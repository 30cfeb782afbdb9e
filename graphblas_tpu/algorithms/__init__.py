from .graph import (bfs_levels, bfs_levels_fused, bfs_parents, pagerank,
                    pagerank_fused, triangle_count)
