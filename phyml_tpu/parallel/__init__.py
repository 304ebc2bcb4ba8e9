from phyml_tpu.parallel.mesh import (
    make_mesh, pattern_sharding, sharded_engine,
)
