from visinger_tpu.models.visinger import VISinger
from visinger_tpu.modules.discriminator import MultiPeriodDiscriminator

__all__ = ["VISinger", "MultiPeriodDiscriminator"]
