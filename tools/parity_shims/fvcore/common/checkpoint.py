"""Checkpointer shim — enough surface for d2 DetectionCheckpointer."""
import os

import torch


class _IncompatibleKeys(tuple):
    pass


class Checkpointer:
    def __init__(self, model, save_dir="", *, save_to_disk=True, **checkpointables):
        self.model = model
        self.save_dir = save_dir
        self.save_to_disk = save_to_disk
        self.checkpointables = checkpointables
        import logging
        self.logger = logging.getLogger(__name__)
        self.path_manager = None

    def save(self, name, **kwargs):
        data = {"model": self.model.state_dict()}
        for k, v in self.checkpointables.items():
            data[k] = v.state_dict()
        data.update(kwargs)
        os.makedirs(self.save_dir, exist_ok=True)
        torch.save(data, os.path.join(self.save_dir, f"{name}.pth"))

    def load(self, path, checkpointables=None):
        if not path:
            return {}
        ckpt = torch.load(path, map_location="cpu")
        self._load_model(ckpt)
        return ckpt

    def _load_model(self, checkpoint):
        sd = checkpoint.get("model", checkpoint)
        self.model.load_state_dict(sd, strict=False)

    def has_checkpoint(self):
        return False

    def get_checkpoint_file(self):
        return ""

    def resume_or_load(self, path, *, resume=True):
        return self.load(path)


class PeriodicCheckpointer:
    def __init__(self, checkpointer, period, max_iter=None, **kwargs):
        self.checkpointer = checkpointer
        self.period = period
        self.max_iter = max_iter

    def step(self, iteration, **kwargs):
        if (iteration + 1) % self.period == 0:
            self.checkpointer.save(f"model_{iteration:07d}", iteration=iteration)

    def save(self, name, **kwargs):
        self.checkpointer.save(name, **kwargs)
