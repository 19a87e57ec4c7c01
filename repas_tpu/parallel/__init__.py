from repas_tpu.parallel.mesh import (frames_mesh, shard_batch,
                                     sharded_frame_pipeline,
                                     fuse_views_allgather, batch_stats_psum)

__all__ = ["frames_mesh", "shard_batch", "sharded_frame_pipeline",
           "fuse_views_allgather", "batch_stats_psum"]
