'''Pose generators (embeds): vectorized TPU sweeps over combinatoric grids.'''

from tscode_tpu.embeds.common import materialize_two_mol, stacked_lobes
from tscode_tpu.embeds.string import string_embed
from tscode_tpu.embeds.cyclical import cyclical_embed

__all__ = ['string_embed', 'cyclical_embed', 'stacked_lobes',
           'materialize_two_mol']
