import os

# Tests run on a virtual 8-device CPU mesh (the TPU analogue of testing
# multi-node without a cluster). Must be set before jax initializes.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
