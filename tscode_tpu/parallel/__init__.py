'''Multi-chip scale-out: pose-axis sharding over a device mesh.'''

from tscode_tpu.parallel.sharding import (
    get_default_mesh, make_mesh, mesh_for, mesh_wants,
    sharded_compenetration_mask, sharded_embed_screen_step,
    sharded_first_similar_successor, sharded_moments,
    sharded_screen_pipeline)

__all__ = ['get_default_mesh', 'make_mesh', 'mesh_for', 'mesh_wants',
           'sharded_compenetration_mask', 'sharded_embed_screen_step',
           'sharded_first_similar_successor', 'sharded_moments',
           'sharded_screen_pipeline']
