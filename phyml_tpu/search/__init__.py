from phyml_tpu.search.bionj import bionj
from phyml_tpu.search.distances import ml_pairwise_distances
