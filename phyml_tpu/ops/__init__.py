from phyml_tpu.ops.likelihood import LikelihoodEngine, TreeArrays
