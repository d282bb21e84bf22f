from . import checkpoint, loss, optimizer, trainer

__all__ = ["checkpoint", "loss", "optimizer", "trainer"]
