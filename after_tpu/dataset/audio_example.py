"""AudioExample: typed named-tensor record.

API mirrors the reference container (/root/reference/after/dataset/
audio_example/audio_example.py:52-137): named buffers with shape/precision,
int16 waveforms auto-rescaled to float on read, metadata dict, and numpy /
jax output.  Serialized as protobuf (audio_example.proto) inside the sharded
record store.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import numpy as np

from . import audio_example_pb2 as pb2

_DTYPE_TO_PRECISION = {
    np.dtype(np.float32): pb2.FLOAT32,
    np.dtype(np.int16): pb2.INT16,
    np.dtype(np.float16): pb2.FLOAT16,
    np.dtype(np.int32): pb2.INT32,
    np.dtype(np.uint8): pb2.UINT8,
}
_PRECISION_TO_DTYPE = {v: k for k, v in _DTYPE_TO_PRECISION.items()}


class AudioExample:

    def __init__(self, b: Optional[bytes] = None):
        self._pb = pb2.AudioExample()
        if b is not None:
            self._pb.ParseFromString(b)

    # -- writing -----------------------------------------------------------

    def put_array(self, key: str, array: np.ndarray,
                  dtype: Optional[np.dtype] = None,
                  sampling_rate: int = 0) -> None:
        array = np.asarray(array)
        if dtype is not None:
            if np.dtype(dtype) == np.int16 and array.dtype.kind == "f":
                array = (np.clip(array, -1, 1) * (2 ** 15 - 1)).astype(np.int16)
            else:
                array = array.astype(dtype)
        buf = self._pb.buffers[key]
        del buf.shape[:]
        buf.shape.extend(array.shape)
        buf.precision = _DTYPE_TO_PRECISION[array.dtype]
        buf.data = array.tobytes()
        buf.sampling_rate = sampling_rate

    def put_metadata(self, metadata: Dict[str, Any]) -> None:
        for k, v in metadata.items():
            self._pb.metadata[k] = v if isinstance(v, str) else json.dumps(v)

    def put_buffer(self, key: str, data: bytes, shape: List[int]) -> None:
        buf = self._pb.buffers[key]
        del buf.shape[:]
        buf.shape.extend(shape)
        buf.precision = pb2.UINT8
        buf.data = data

    # -- reading -----------------------------------------------------------

    def get(self, key: str) -> np.ndarray:
        if key == "metadata":
            return self.get_metadata()
        if key not in self._pb.buffers:
            raise KeyError(f"{key} not in example (has {self.get_keys()})")
        buf = self._pb.buffers[key]
        array = np.frombuffer(buf.data,
                              dtype=_PRECISION_TO_DTYPE[buf.precision])
        array = array.reshape(tuple(buf.shape))
        if buf.precision == pb2.INT16:
            # int16 waveforms auto-rescale to float (reference :81-82)
            array = array.astype(np.float32) / (2 ** 15 - 1)
        return array

    def get_bytes(self, key: str) -> bytes:
        return self._pb.buffers[key].data

    def get_metadata(self) -> Dict[str, str]:
        return dict(self._pb.metadata)

    def get_keys(self) -> List[str]:
        return list(self._pb.buffers.keys())

    def as_dict(self, keys: Optional[List[str]] = None) -> Dict[str, Any]:
        keys = keys if keys is not None else self.get_keys()
        return {k: self.get(k) for k in keys}

    def serialize(self) -> bytes:
        return self._pb.SerializeToString()

    def __contains__(self, key):
        return key in self._pb.buffers
