from pero_pretraining_tpu.losses.masked_ce import masked_cross_entropy
from pero_pretraining_tpu.losses.vicreg import vicreg_loss
from pero_pretraining_tpu.losses.ntxent import ntxent_loss

__all__ = ["masked_cross_entropy", "vicreg_loss", "ntxent_loss"]
