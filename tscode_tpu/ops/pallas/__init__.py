'''Hand-written Pallas TPU kernels for the hottest screening ops.'''
