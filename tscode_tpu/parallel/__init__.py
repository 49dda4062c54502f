'''Multi-chip scale-out: pose-axis sharding over a device mesh.'''

from tscode_tpu.parallel.sharding import (make_mesh, sharded_screen_pipeline,
                                          sharded_embed_screen_step)

__all__ = ['make_mesh', 'sharded_screen_pipeline',
           'sharded_embed_screen_step']
