from gfe_mamba_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from gfe_mamba_tpu.parallel.sharding import (
    infer_param_shardings,
    apply_param_shardings,
)
from gfe_mamba_tpu.parallel import multihost
