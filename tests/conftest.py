import os

# Tests run on a virtual 8-device CPU mesh (the TPU analogue of testing
# multi-node without a cluster). The environment pins JAX_PLATFORMS=axon
# (the tunneled TPU), so the env var alone is not enough — the jax config
# must be updated before any backend initializes.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
