import os
import sys

# Run tests on a virtual 8-device CPU mesh (the TPU 'axon' plugin registers
# itself via sitecustomize, so plain JAX_PLATFORMS env vars are not enough).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"
SHARED_BAMS = os.path.join(REFERENCE_ROOT, "src/test/SharedData/Bams")
SHARED_GENOMES = os.path.join(REFERENCE_ROOT, "src/test/SharedData/Genomes")


def shared_bam(name: str) -> str:
    return os.path.join(SHARED_BAMS, name)


def shared_genome(name: str) -> str:
    return os.path.join(SHARED_GENOMES, name)
