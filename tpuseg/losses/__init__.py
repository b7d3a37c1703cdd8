from tpuseg.losses.peak import peak_loss
from tpuseg.losses.box_fg import fg_loss
from tpuseg.losses.combined import total_loss

__all__ = ["peak_loss", "fg_loss", "total_loss"]
