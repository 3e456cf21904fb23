"""proteus_tpu — a TPU-native framework with the capabilities of NASA/JPL's
PROTEUS (DSWx-HLS Science Application Software).

The per-pixel science core (spectral indices, diagnostic tests, class
interpretation, aerosol/landcover/shadow/cloud masking) runs as fused JAX/XLA
(+ optional Pallas) kernels on HBM-resident tile tensors; GeoTIFF/COG I/O,
reprojection planning, runconfig parsing, and metadata stay on host. Campaign
mode shards batched tile stacks across a TPU slice via ``jax.sharding``.

Layer map (each module's docstring cites the reference behavior it matches):

- ``proteus_tpu.config``    runconfig system (defaults + schema + deep-merge)
- ``proteus_tpu.core``      science constants / thresholds (pytrees)
- ``proteus_tpu.models``    the DSWx-HLS product chain (pure jax functions)
- ``proteus_tpu.ops``       reusable device ops (LUTs, morphology, resampling,
                            Otsu, Pallas kernels)
- ``proteus_tpu.geo``       CRS math (UTM/WGS84/MGRS), warp-as-gather, polygons
- ``proteus_tpu.io``        GeoTIFF/COG codec, HLS readers, shapefile, PNG
- ``proteus_tpu.parallel``  campaign sharding (mesh, shard_map, manifest)
- ``proteus_tpu.runtime``   orchestrator, metadata, logging, comparator
- ``proteus_tpu.cli``       command-line entry points
"""

from proteus_tpu.version import VERSION

__version__ = VERSION


def generate_dswx_layers(*args, **kwargs):
    """Library API (reference-compatible); see
    proteus_tpu.runtime.orchestrator.generate_dswx_layers."""
    from proteus_tpu.runtime.orchestrator import generate_dswx_layers as f
    return f(*args, **kwargs)


def compare_dswx_hls_products(*args, **kwargs):
    from proteus_tpu.runtime.compare import compare_dswx_hls_products as f
    return f(*args, **kwargs)


def save_as_cog(*args, **kwargs):
    from proteus_tpu.io.cog import save_as_cog as f
    return f(*args, **kwargs)
