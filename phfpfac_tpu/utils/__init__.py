from phfpfac_tpu.utils.config import PfacConfig  # noqa: F401
from phfpfac_tpu.utils.timing import PhaseTimer  # noqa: F401
