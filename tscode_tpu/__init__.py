'''tscode_tpu: TPU-native transition-state conformational docker.'''

__version__ = '0.1.0'
