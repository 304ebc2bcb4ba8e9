from phyml_tpu.models.substitution import SubstModel
