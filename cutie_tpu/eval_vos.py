"""Benchmark evaluation entry point.

Behavioral parity target: reference cutie/eval_vos.py:23-176. Usage mirrors
the hydra CLI:

    python -m cutie_tpu.eval_vos dataset=d17-val weights=cutie-base-mega.pth \
        image_directory=... mask_directory=... size=480

Per-frame timing is synchronized by a tiny D2H fetch (the analog of the
reference's CUDA-event timing; plain block_until_ready can return early on
remote devices); FPS and peak device memory are logged at the end.
"""
from __future__ import annotations

import logging
import os
import sys
import time
from os import path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cutie_tpu_jax_cache")

import jax
import numpy as np

from cutie_tpu.config import eval_config, get_dataset_cfg
from cutie_tpu.data.burst import BURSTResultHandler, BURSTTestDataset
from cutie_tpu.data.prefetch import prefetch_iter
from cutie_tpu.data.video_reader import VOSTestDataset
from cutie_tpu.inference import InferenceCore
from cutie_tpu.utils.get_default_model import build_model
from cutie_tpu.utils.results import ResultSaver, make_zip

log = logging.getLogger(__name__)


def eval_vos(cfg) -> dict:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # conv/matmul multiply precision for the fp32 network stacks:
    #   default  — bf16 multiplies on the MXU (fast; the attention-affinity
    #              chain stays fp32-HIGHEST regardless: ops/memory.py)
    #   highest  — full fp32 everywhere (bit-closest to the reference)
    prec = cfg.get("matmul_precision")
    if prec:
        jax.config.update("jax_default_matmul_precision", prec)

    run_dir = cfg.output_dir or path.join("output", cfg.exp_id, cfg.dataset)
    os.makedirs(run_dir, exist_ok=True)
    log.info("All configuration: %s", cfg.to_dict())

    dataset_name = cfg.dataset
    data_cfg = get_dataset_cfg(cfg)
    is_burst = "burst" in dataset_name

    bundle = build_model(cfg, weights=cfg.weights)
    if not cfg.weights or not path.exists(str(cfg.weights)):
        log.warning("No model weights loaded. Are you sure about this?")

    image_dir = data_cfg.image_directory
    json_dir = data_cfg.get("json_directory")
    size_dir = data_cfg.get("size_directory")
    if is_burst:
        meta_dataset = BURSTTestDataset(image_dir, json_dir, size=data_cfg.size,
                                        skip_frames=data_cfg.skip_frames)
        burst_handler = BURSTResultHandler(meta_dataset.json)
    else:
        meta_dataset = VOSTestDataset(image_dir, data_cfg.mask_directory,
                                      use_all_masks=data_cfg.use_all_masks,
                                      req_frames_json=json_dir,
                                      size=data_cfg.size, size_dir=size_dir,
                                      subset=data_cfg.get("subset"))

    save_all = data_cfg["save_all"]
    mask_output_root = path.join(run_dir, "Annotations")
    score_output_root = path.join(run_dir, "Scores")
    visualize_output_root = path.join(run_dir, "Visualizations")

    total_process_time = 0.0
    total_frames = 0

    # multi-host eval: videos are embarrassingly parallel — stride them by
    # process (SURVEY §2.10: per-host video sharding replaces the reference's
    # single-process eval)
    pidx, pcnt = jax.process_index(), jax.process_count()

    for vid_reader in meta_dataset.get_datasets(process_index=pidx,
                                                 process_count=pcnt):
        vid_name = vid_reader.vid_name
        vid_length = len(vid_reader)
        log.info("Processing %s (%d frames)", vid_name, vid_length)

        processor = InferenceCore(bundle, cfg)
        saver = ResultSaver(
            mask_output_root, vid_name, dataset=dataset_name,
            object_manager=processor.object_manager,
            use_long_id=vid_reader.use_long_id, palette=vid_reader.get_palette(),
            save_scores=cfg.save_scores, score_output_root=score_output_root,
            visualize_output_root=visualize_output_root, visualize=cfg.visualize,
            init_json=vid_reader.sequence_json if is_burst else None)
        first_mask_loaded = False

        def can_preupload(rgb) -> bool:
            # pipelined device_put only helps when step() won't host-resize
            mis = cfg.max_internal_size
            return mis <= 0 or min(rgb.shape[:2]) <= mis

        try:
            # H2D pipelining on the dispatch thread: upload frame t+1 right
            # after dispatching frame t (async jit). A threaded-prefetch
            # device_put was measured slower (GIL/tunnel contention with
            # dispatch); decode still happens in prefetch_iter's workers.
            stream = enumerate(prefetch_iter(vid_reader, num_workers=4))
            _, buf = next(stream, (None, None))
            next_rgb_d = None
            ti = -1
            while buf is not None:
                ti += 1
                data = buf
                image = next_rgb_d if next_rgb_d is not None else data["rgb"]
                next_rgb_d = None
                mask = data.get("mask")
                valid_labels = data.get("valid_labels")
                if valid_labels is not None:
                    valid_labels = [int(x) for x in valid_labels]
                info = data["info"]

                skip = not first_mask_loaded and mask is None
                if mask is not None:
                    first_mask_loaded = True
                if not skip:
                    # timed window = the step alone (reference CUDA-event
                    # semantics); the blocking prefetch fetch below would
                    # otherwise count host decode stalls as model time.
                    # The tiny D2H fetch forces completion: on tunneled
                    # devices jax.block_until_ready can return before
                    # execution finishes (see bench.py methodology note)
                    t0 = time.perf_counter()
                    prob = processor.step(image, mask, valid_labels,
                                          end=(ti == vid_length - 1))
                    np.asarray(prob[:1, :1, :1])
                    total_process_time += time.perf_counter() - t0
                    total_frames += 1
                _, buf = next(stream, (None, None))
                if buf is not None and can_preupload(buf["rgb"]):
                    next_rgb_d = jax.device_put(buf["rgb"])
                if skip:
                    continue

                if save_all or info["save"]:
                    saver.process(prob, info["frame"],
                                  resize_needed=info["resize_needed"],
                                  shape=info["shape"],
                                  last_frame=(ti == vid_length - 1),
                                  path_to_image=info["path_to_image"])
            saver.end()
            if is_burst:
                burst_handler.add_sequence(saver.video_json)
        except Exception as e:
            log.error("Runtime error at %s: %s", vid_name, e)
            saver.end()
            raise

    log.info("Total processing time: %s", total_process_time)
    log.info("Total processed frames: %s", total_frames)
    fps = total_frames / total_process_time if total_process_time else 0.0
    log.info("FPS: %s", fps)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        log.info("Peak device memory (MB): %s",
                 stats.get("peak_bytes_in_use", 0) / 2 ** 20)
    except Exception:
        pass

    if pcnt > 1:
        # all hosts must finish writing masks before rank 0 zips; BURST
        # handlers hold disjoint video shards, so each dumps its own file
        # (merge offline) instead of last-writer-wins on predictions.json
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("eval_vos_results_written")
        if is_burst:
            burst_handler.dump(run_dir, suffix=f"_rank{pidx}")
        if pidx == 0:
            make_zip(dataset_name, run_dir, cfg.exp_id, mask_output_root)
    else:
        make_zip(dataset_name, run_dir, cfg.exp_id, mask_output_root)
        if is_burst:
            burst_handler.dump(run_dir)
    return {"fps": fps, "total_frames": total_frames}


def main():
    logging.basicConfig(level=logging.INFO)
    cfg = eval_config("base")
    cfg.apply_overrides(sys.argv[1:])
    # re-apply model preset if overridden, e.g. model=small
    if isinstance(cfg.get("model"), str):
        from cutie_tpu.config import model_base, model_small
        cfg.model = model_small() if cfg.model == "small" else model_base()
    eval_vos(cfg)


if __name__ == "__main__":
    main()
