"""Input pipeline: folder scanning, host-side decode/augment, device-side prep.

TPU-native restructuring of the reference's data layer (reference data.py:26-178):
the CPU side produces uint8 NHWC batches (cheap to transfer), and everything
numeric — normalization, mixup, label smoothing — runs inside the jitted step
(the reference approximates this with Composer DataSpec device_transforms,
reference data.py:153-164).
"""

from hvt.data.device import DevicePrep
from hvt.data.folder import DatasetInfo, scan_image_folder
from hvt.data.loader import Batch, build_dataset, build_loader

__all__ = [
    "Batch",
    "DatasetInfo",
    "DevicePrep",
    "build_dataset",
    "build_loader",
    "scan_image_folder",
]
