"""Typed configuration — one source of truth for every entry point.

Replaces the reference's three inconsistent argparse blocks
(train_2ddense.py:21-34, train_hybrid.py:23-36, test.py:20-36) plus its
hardcoded module globals (denseunet.py:29-40, callbacks.py:28). Notably it does
NOT replicate the `args.b / 10` GPU-count trap (train_2ddense.py:180, vs
bash_train.sh passing -b 4): device count comes from the mesh, and the global
batch is validated against it.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple


@dataclasses.dataclass
class DataConfig:
    data_dir: str = "data"
    num_train_volumes: int = 131  # LiTS training set
    num_test_volumes: int = 70  # LiTS test set
    mean: float = 48.0  # intensity mean subtracted (train_2ddense.py:32)
    hu_window: Tuple[float, float] = (-200.0, 250.0)  # preprocessing.py:15-16
    # volumes with liver but no tumor; always sample liver-guided crops for them
    # (train_2ddense.py:39)
    tumor_free_volumes: Tuple[int, ...] = (
        32, 34, 38, 41, 47, 87, 89, 91, 105, 106, 114, 115, 119,
    )
    box_dilation: int = 3  # liver bounding-box dilation (train_2ddense.py:151-156)
    # liver bounding box support: 'liver' = label==1 voxels only (EXACT
    # reference semantics, preprocessing.py:63-75 over the LiverPixels list);
    # 'any' = label>=1 superset (opt-in deviation: also covers label-noise
    # tumor voxels outside the label-1 support). Quantified in
    # tests/test_data.py::test_box_mode_deviation_quantified.
    box_labels: str = "liver"
    # crop resize backend: 'cv2' (INTER_CUBIC/INTER_NEAREST Catmull-Rom
    # family — fast default, documented deviation) | 'spline' (order-3/order-0
    # B-spline via ndimage.zoom(grid_mode=True), the skimage.transform.resize
    # family the reference uses, train_2ddense.py:96-97). Delta quantified in
    # tests/test_data.py::test_resize_backend_deviation_quantified.
    resize_backend: str = "cv2"
    scale_range: Tuple[float, float] = (0.8, 1.2)  # random crop scale (:48)
    liver_sample_prob: float = 0.5  # P(liver-guided) vs tumor-guided (:111-112)
    crop_threads: int = 8  # reference uses 14 (:33); host-dependent
    prefetch_depth: int = 4  # device prefetch buffer (replaces GeneratorEnqueuer)


@dataclasses.dataclass
class ModelConfig:
    input_size: int = 224  # H = W of training crops
    input_cols: int = 8  # z-depth of hybrid sub-volumes (3 for 2D slabs)
    num_classes: int = 3  # bg / liver / tumor
    reduction: float = 0.5
    compute_dtype: str = "float32"  # 'bfloat16' for the fast path
    preset: str = "full"  # 'full' (reference layout) | 'tiny' (tests/dry runs)
    # Training-side execution variants for the hybrid stages (3dpart/end2end);
    # semantics-preserving (same MAC set / parameters as the canonical path,
    # equal to float-summation order) — see InferConfig.layout3d / stem_s2d
    # for the serving-side knobs and BENCH_NOTES.md for measurements.
    # Caveat for layout3d='dhwc' under train=True: dropout masks are drawn in
    # the d-major orientation — a different random realization of the same
    # distribution (eval/inference is exact; tests/test_train.py).
    layout3d: str = "hwdc"
    stem_s2d: bool = False


@dataclasses.dataclass
class TrainConfig:
    arch: str = "2d"  # '2d' | '3dpart' | 'end2end'
    batch: int = 8  # GLOBAL batch (sharded over the mesh 'data' axis)
    lr: float = 1e-3
    momentum: float = 0.9
    nesterov: bool = True
    epochs: int = 6000
    samples_per_epoch: int = 27386  # train_2ddense.py:206
    steps_per_epoch: Optional[int] = None  # derived if None
    loss_weights: Tuple[float, float, float] = (0.78, 0.65, 8.57)  # loss.py:23
    mask_boundary_slices: bool = True  # hybrid loss drops z 0 and D-1 (loss.py:6-7)
    save_path: str = "Experiments"
    checkpoint_every_steps: int = 1000
    seed: int = 0
    remat: bool = True  # jax.checkpoint on dense blocks to fit HBM
    # remat granularity when remat=True: 'full' saves nothing inside each
    # conv block (max memory win, ~1 extra forward per block); 'convs' saves
    # the conv outputs and recomputes only the elementwise BN/Scale/ReLU
    # chains (most of the memory win, a fraction of the recompute —
    # benchmarks/train_attrib.py records the measured trade)
    remat_policy: str = "full"
    log_every_steps: int = 20
    # optimizer steps executed per device dispatch (lax.scan over stacked
    # batches); >1 amortizes per-dispatch host latency on high-latency links
    steps_per_dispatch: int = 1
    # donate the TrainState to the jitted step (in-place buffer reuse, halves
    # state HBM). Free on direct-attached TPUs; measured 45 ms -> 54 s/step
    # through this image's tunneled backend (donation round-trips buffers
    # through the host link), so off by default here.
    donate_state: bool = False

    def resolved_steps_per_epoch(self) -> int:
        if self.steps_per_epoch is not None:
            return self.steps_per_epoch
        divisor = self.batch * (6 if self.arch != "2d" else 1)
        return max(1, self.samples_per_epoch // divisor)


@dataclasses.dataclass
class InferConfig:
    input_size: int = 512
    input_cols: int = 8
    window_stride: int = 2  # input_cols // 4 (lib/funcs.py:12)
    window_batch: int = 8  # windows evaluated per device step (reference: 1);
    # 8 measured fastest on v5e (13.7 s/volume vs 23.8 at 4): the 2D branch
    # sees a 64-image MXU batch per step
    thres_liver: float = 0.5  # test.py:34
    thres_tumor: float = 0.9  # test.py:35
    mean: float = 48.0
    liver_margin_lo: int = 5  # z-range margins around the liver mask (funcs.py:19-20)
    liver_margin_hi: int = 10
    save_path: str = "results"
    # run the whole sliding-window algorithm as one device-resident XLA
    # program per volume (infer/device_pipeline.py) and fetch a thresholded
    # uint8 mask; False = host-loop path (infer/sliding_window.py)
    device_resident: bool = True
    # fast mode: compute the 2D branch once per z-slice instead of once per
    # overlapping window (~4x less 2D work). Window-EDGE slice stacks then use
    # volume neighbors instead of window-boundary replication — interior
    # outputs can differ slightly through the 3D receptive field. Exact
    # reference semantics when False.
    shared_2d: bool = False
    # EXACT in-batch 2D dedup: stride-aligned window runs share interior
    # slice-stacks, cutting 2D-branch compute ~44% at window_batch=8 with
    # bit-identical semantics (the hybrid's 2D BNs are always frozen, so
    # batch composition cannot change values)
    dedup_2d: bool = True
    # unroll factor for the device loop over window batches (lax.scan
    # unroll): >1 lets XLA schedule batch i+1's 2D encoder against batch i's
    # 3D/accumulate tail. Semantics identical; see BENCH_NOTES.md for the
    # measured effect.
    batch_unroll: int = 1
    # XLA activation layout of the 3D branch: 'hwdc' (canonical, spatial =
    # (H,W,D)) | 'dhwc' (d-major, spatial = (D,H,W), models/dmajor.py — keeps
    # (W,C) in the memory tile's minor dims so small mid-network D doesn't
    # pad the sublane dim). Bit-identical outputs; BENCH_NOTES.md round-3
    # records the per-op and model-level measurements.
    layout3d: str = "hwdc"
    # space-to-depth 3D stem (models/s2d.py): the 7^3 stride-2 stem as a
    # stride-1 4^3 conv over the 2^3 parity subgrids stacked into channels —
    # same MAC set, measured 5.9x faster at the real stem shape (the Cin=4
    # input starves the MXU contraction otherwise). Exact modulo
    # float-summation order; parity-tested in tests/test_models.py. Default ON
    # since round 4: the per-op win is unambiguous and the round-4 model-level
    # interleaved A/B measured it <= base at every quantile (BENCH_NOTES.md
    # "Round-4 model-level verdict").
    stem_s2d: bool = True
    # labelmask wire width: 2 = z-cropped 2-bit-packed mask d2h (labels are
    # {0,1,3} — lossless, 4x+ fewer bytes than uint8, packing fused into the
    # scoring program); 8 = plain uint8 mask. Byte-identical labelmaps.
    wire_bits: int = 2
    # run the reference's connected-component postprocess (test.py:70-115) on
    # device (infer/device_postprocess.py: min-index label propagation +
    # border-connected hole fill) instead of host scipy. Byte-identical
    # labelmaps (integer/boolean ops only — no float reassociation; parity
    # tests in tests/test_device_postprocess.py); the host pipeline measured
    # 38-64 s/volume on a 1-core host vs chip-side milliseconds (BENCH_NOTES
    # "Round-5 serving-path attribution"). Applies to the device-resident
    # serving path only. Default OFF on this dev host: the single-dispatch
    # compose crashed the tunneled TPU worker TWICE at full 512^2 size
    # (BENCH_NOTES "Round-5 device-postprocess verdict" — the stdio-relay
    # backend kills dispatches past ~90-130 s and the CC propagation loops
    # can exceed that); the chunked propagation path bounds every dispatch
    # but stays opt-in until it has a clean full-size record.
    device_postprocess: bool = False
    # with device_postprocess: keep the final labelmap on device, fetch its
    # 6-int nonzero bbox, and wire only the bbox crop (2-bit packed, sizes
    # bucketed to 64/64/16). Lossless — after largest-CC the nonzero extent
    # is one liver-sized blob, so d2h shrinks by the bbox/volume ratio at the
    # cost of one extra scalar round-trip + crop dispatch per volume.
    sparse_wire: bool = True
    # with device_postprocess: >0 bounds every CC-propagation dispatch to
    # this many rounds (device_postprocess.propagate_min_chunked — bursts of
    # chunked dispatches chained asynchronously, one scalar convergence fetch
    # per propagation stage). Byte-identical fixpoints; the crash-proof form
    # for backends that kill long dispatches (this host's relay kills past
    # ~90-130 s, and the single-dispatch compose crashed its worker twice at
    # 512^2 full size — BENCH_NOTES "Round-5 device-postprocess verdict").
    # 0 = single-dispatch compose (direct-attached hosts).
    postprocess_chunk_iters: int = 2


@dataclasses.dataclass
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    infer: InferConfig = dataclasses.field(default_factory=InferConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)

        def build(tp, d):
            fields = {f.name: f for f in dataclasses.fields(tp)}
            kwargs = {}
            for k, v in d.items():
                if k not in fields:
                    raise KeyError(f"unknown config key {tp.__name__}.{k}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return tp(**kwargs)

        return cls(
            data=build(DataConfig, raw.get("data", {})),
            model=build(ModelConfig, raw.get("model", {})),
            train=build(TrainConfig, raw.get("train", {})),
            infer=build(InferConfig, raw.get("infer", {})),
        )

    @classmethod
    def load(cls, path) -> "Config":
        return cls.from_json(Path(path).read_text())

    def save(self, path) -> None:
        Path(path).write_text(self.to_json())
