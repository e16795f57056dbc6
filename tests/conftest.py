import os
import sys

# run JAX on a virtual 8-device CPU mesh for sharding tests
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"
SHARED_BAMS = os.path.join(REFERENCE_ROOT, "src/test/SharedData/Bams")
SHARED_GENOMES = os.path.join(REFERENCE_ROOT, "src/test/SharedData/Genomes")


def shared_bam(name: str) -> str:
    return os.path.join(SHARED_BAMS, name)


def shared_genome(name: str) -> str:
    return os.path.join(SHARED_GENOMES, name)
