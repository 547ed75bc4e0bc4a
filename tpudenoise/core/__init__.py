from tpudenoise.core.config import (AttrDict, cfg, cfg_from_file,
                                    cfg_from_list, default_config,
                                    get_output_dir, get_output_tb_dir)
from tpudenoise.core.mesh import make_mesh, shard_batch
