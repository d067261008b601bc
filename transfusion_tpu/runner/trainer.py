"""The config-driven training/eval orchestrator.

Host-side equivalent of the reference's Lightning module + Trainer wiring
(``runner/abc_nao_trainer.py`` + ``runner/nao/ego_nao_trainer.py`` +
``runner/run_experiment.py:329-490``) on top of the jit'd steps:

  * builds datasets/mappings/weights from a derived reference config;
  * one compiled train program per resize bucket; gradient accumulation,
    clipping, RAdam, epoch LR schedules inside the optimizer;
  * per-epoch dynamics as dynamic inputs instead of recompiles: the lm loss
    weight decay (``abc_nao_trainer.py:160-163``) and the epoch
    unfreeze triggers (backbone ``train_ep``/``trainable_layers``, narration
    encoder ``train_ep``) become multiplier trees applied to the optimizer
    updates;
  * validation runs the eval program per bucket, feeds the STA metric, and
    writes the challenge JSON per epoch; checkpoints save every epoch.
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.data.annotations import load_sta_annotations
from transfusion_tpu.data.dataset import EgoNaoDataset, build_narration_lookup
from transfusion_tpu.data.labels import (
    balanced_class_weights,
    frequencies_to_array,
    get_label_mapping,
    noun_verb_frequencies,
)
from transfusion_tpu.data.loader import DataLoader
from transfusion_tpu.data.splits import apply_split, load_split
from transfusion_tpu.data.tokenizer import (
    GPT2BPETokenizer,
    SentencePieceTokenizer,
    WordPieceTokenizer,
    hash_gpt2_tokenizer,
    hash_t5_tokenizer,
    hash_vocab_tokenizer,
)
from transfusion_tpu.data.transforms import AugConfig
from transfusion_tpu.metrics import STAMeanAveragePrecision
from transfusion_tpu.models.transfusion import TransFusion, build_transfusion_config
from transfusion_tpu.parallel.mesh import (
    allgather_pyobj,
    make_mesh,
    opt_state_shardings,
    param_shardings,
    shard_batch,
)
from transfusion_tpu.runner.export import detections_to_results, write_result_json
from transfusion_tpu.train.checkpoint import CheckpointManager, monitor_metric_name, replace_heads
from transfusion_tpu.train.losses import build_class_weights
from transfusion_tpu.train.optim import make_optimizer
from transfusion_tpu.train.step import (
    LossConfig,
    criterion_weights,
    init_state,
    make_eval_loss_step,
    make_eval_step,
    make_train_step,
    normalized_criterion_weights,
)

log = logging.getLogger("transfusion_tpu")


def build_tokenizer(model_v: str, max_length: int = 128):
    """Host-side tokenizer matching the language tower the config selects
    (the reference tokenizes inside the model via AutoTokenizer,
    narr_pooling_layers.py:270,351; here it is a data-pipeline step).

    Vocab files come from env vars so everything stays offline:
      * sbert variants: TOKENIZER_VOCAB -> WordPiece vocab.txt
      * distilgpt2:     GPT2_VOCAB_JSON + GPT2_MERGES (or TOKENIZER_DIR)
      * t5-*/flan-t5-*: T5_SPM .model protobuf (or TOKENIZER_DIR/spiece.model)
    Deterministic hash fallbacks keep every path runnable without files
    (NOT checkpoint-compatible; a warning is logged)."""
    tok_dir = os.environ.get("TOKENIZER_DIR", "")
    if model_v == "distilgpt2":
        vj = os.environ.get("GPT2_VOCAB_JSON", os.path.join(tok_dir, "vocab.json"))
        mg = os.environ.get("GPT2_MERGES", os.path.join(tok_dir, "merges.txt"))
        if os.path.isfile(vj) and os.path.isfile(mg):
            return GPT2BPETokenizer.from_files(vj, mg, max_length=max_length)
        log.warning("no GPT-2 vocab/merges files; using hash-fallback BPE tokenizer")
        return hash_gpt2_tokenizer(max_length=max_length)
    if model_v.startswith(("t5-", "flan-t5-")):
        spm = os.environ.get("T5_SPM", os.path.join(tok_dir, "spiece.model"))
        if os.path.isfile(spm):
            return SentencePieceTokenizer.from_model_file(spm, max_length=max_length)
        log.warning("no T5 spiece.model; using hash-fallback unigram tokenizer")
        return hash_t5_tokenizer(max_length=max_length)
    vocab_path = os.environ.get("TOKENIZER_VOCAB", "")
    if vocab_path and os.path.isfile(vocab_path):
        return WordPieceTokenizer.from_vocab_file(vocab_path, max_length=max_length)
    log.warning("no TOKENIZER_VOCAB file; using deterministic hash vocab")
    return hash_vocab_tokenizer(max_length=max_length)


def dataset_root(config: dict) -> str:
    name = config["dataset"]["name"]
    sub = {"ego4d": "Ego4d/v1", "ego4djpg": "Ego4d/v1", "ego4djpgv2": "Ego4d/v2"}[name]
    return os.path.join(os.path.expandvars("$DATA"), sub)


def backbone_stop_grad_stages(epoch: int, model_cfg: dict,
                              freeze_backbone_at_epoch: int = -1) -> int:
    """Static frozen-prefix depth for the epoch's train step (ResNet trunks).

    Mirrors the freeze rules of :func:`unfreeze_multipliers` for the trunk
    prefix only: before ``train_ep`` (or with ``train_ep == -1``, the v2
    flagship, ego_vis_det_ego4dv2.yml:3) the whole body [stem..layer4] is
    frozen; afterwards the deepest ``trainable_layers`` stages train
    (faster_rcnn_wrapper.py:135-146). ``freeze_backbone_at_epoch`` re-freezes
    everything (ego_nao_trainer.py:265-272)."""
    if str(model_cfg.get("type", "res50")).startswith("mobilenet"):
        return 0
    train_ep = model_cfg.get("train_ep", -1)
    backbone_on = train_ep != -1 and epoch >= train_ep
    if freeze_backbone_at_epoch != -1 and epoch >= freeze_backbone_at_epoch:
        backbone_on = False
    if not backbone_on:
        return 5
    return max(5 - min(int(model_cfg.get("trainable_layers", 0)), 5), 0)


def unfreeze_multipliers(params, epoch: int, model_cfg: dict, narr_train_ep: int,
                         narr_finetune_layers: int, num_bert_layers: int,
                         freeze_backbone_at: int = -1, text_encoder: str = "sbert"):
    """0/1 multiplier tree for optimizer updates implementing the epoch
    triggers: backbone body frozen until model train_ep (and only
    ``trainable_layers`` deepest stages ever unfreeze,
    ``faster_rcnn_wrapper.py:135-146``); narration encoder frozen except the
    last ``finetune_layers`` + out_mlp after its train_ep
    (``narr_pooling_layers.py:86-113``); ``freeze_backbone_at_epoch`` freezes
    everything but the RoI heads (``ego_nao_trainer.py:265-272``)."""
    train_ep = model_cfg.get("train_ep", -1)
    trainable_layers = model_cfg.get("trainable_layers", 0)
    backbone_on = train_ep != -1 and epoch >= train_ep
    if str(model_cfg.get("type", "res50")).startswith("mobilenet"):
        # torchvision mobilenet_backbone freezes up to
        # stage_indices[num_stages - trainable_layers]; stages start at
        # features [0, 2, 4, 7, 13, 16] -> stem, block_1/3/6/12, head.
        stage_first_block = [None, 1, 3, 6, 12]  # None = stem
        k = min(trainable_layers, 6)
        cut = 15 if k <= 1 else stage_first_block[6 - k] if 6 - k >= 1 else -1
        unfrozen_stages = {f"block_{i}" for i in range(0 if cut < 0 else cut, 15)}
        if k >= 6:
            unfrozen_stages.add("stem")
    else:
        # layers_to_train = [layer4, layer3, layer2, layer1, stem][:trainable_layers]
        unfrozen_stages = {f"layer{4 - i}" for i in range(min(trainable_layers, 4))}
        if trainable_layers == 5:
            unfrozen_stages.add("stem")

    narr_on = narr_train_ep != -1 and epoch >= narr_train_ep
    # Per-tower unfreeze sets: SBert's last finetune_layers
    # (narr_pooling_layers.py:86-113); GPT-2's block-5 MLP
    # (narr_pooling_layers.py:279-284); T5's last encoder block
    # (narr_pooling_layers.py:360-365).
    if text_encoder == "gpt2":
        unfrozen_bert = {f"h_{num_bert_layers - 1}/mlp"}
    elif text_encoder == "t5":
        unfrozen_bert = {f"block_{num_bert_layers - 1}"}
    else:
        unfrozen_bert = {f"layer_{num_bert_layers - 1 - i}" for i in range(narr_finetune_layers)}

    roi_only = freeze_backbone_at != -1 and epoch >= freeze_backbone_at

    def assign(path, leaf):
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if roi_only:
            trainable = ("box_head" in joined or "predictors" in joined)
            return 1.0 if trainable else 0.0
        if "backbone" in joined:
            return 1.0 if backbone_on and any(s in joined for s in unfrozen_stages) else 0.0
        if "narr_encoder" in joined:
            if "out_mlp" in joined:
                return 1.0
            return 1.0 if narr_on and any(s in joined for s in unfrozen_bert) else 0.0
        return 1.0

    return jax.tree_util.tree_map_with_path(assign, params)


class _ZeroHandLookup:
    """Zero-filled hand history when the FrankMocap cache is unavailable —
    keeps the ttc_hand_head path runnable (the head sees all-zero hands,
    matching the reference's missing-detection zero-fill)."""

    def __init__(self, num_steps: int = 5):
        self.num_steps = num_steps

    def get(self, video_id, frame_idx):
        from transfusion_tpu.data.hand_pose import HAND_FEAT_DIM

        n = 2 * self.num_steps
        return np.zeros((n, 4), np.float32), np.zeros((n, HAND_FEAT_DIM), np.float32)


@dataclass
class EvalResult:
    metrics: dict
    result_json_path: str | None


class EgoNaoTrainer:
    def __init__(self, config: dict, run_dir: str, debug: bool = False, mesh=None, seed=None,
                 fsdp: bool = False, tp_min_dim: int | None = None):
        self.config = config
        self.run = config["run"]
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.debug = debug
        self.seed = seed if seed is not None else self.run.get("seed", 42)
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        # ZeRO-3-style fully-sharded data parallelism: large params + moments
        # shard over the data axis (see parallel.mesh.param_shardings).
        self.fsdp = fsdp or self.run.get("fsdp", False)
        # Smallest matmul dim worth splitting over the model axis (the
        # flagship's fusion dims clear the 256 default; tiny test/dryrun
        # models lower it so --mesh-model actually exercises the tp path —
        # without this the model axis silently no-ops on small models).
        self.tp_min_dim = (
            tp_min_dim if tp_min_dim is not None
            else int(self.run.get("tp_min_dim", 256))
        )

        self._build_data()
        self._build_model()
        self._build_steps()
        self.ckpt = CheckpointManager(run_dir)
        self.monitor = monitor_metric_name(self.run["criterion"])
        self.history: list[dict] = []
        self._build_plotter()

    def _build_plotter(self):
        """Per-epoch GT-vs-prediction plot grids (BboxPlotterCallback
        equivalent); disabled when matplotlib is unavailable."""
        try:
            from transfusion_tpu.runner.callbacks import BboxPlotter

            noun_names = {v: k for k, v in self.noun_mapping.items()}
            verb_names = {v: k for k, v in self.verb_mapping.items()}
            self.plotter = BboxPlotter(
                self.run_dir, noun_names, verb_names,
                normalization=self.aug.normalization, channel_order=self.aug.channel_order,
            )
        except Exception:  # pragma: no cover - matplotlib missing
            self.plotter = None

    # ---------------------------------------------------------------- data
    def _build_data(self):
        cfg = self.config
        ds_args = cfg["dataset"]["args"]
        root = dataset_root(cfg)
        annots = load_sta_annotations(
            root,
            resize_boxes=cfg["dataset"]["name"] == "ego4d",
            narr_structure=ds_args.get("narr_structure", "{gt_narr}"),
            narr_external_paths=ds_args.get("narr_external_paths", []),
        )
        if self.debug:
            keep = annots["clip_id"].isin(annots["clip_id"].unique()[:2])
            annots = annots[keep]

        mapping_file = None
        if ds_args.get("use_external_label_mapping"):
            version = "v2" if cfg["dataset"]["name"].endswith("v2") else "v1"
            mapping_file = os.path.expandvars(
                f"$CODE/data_preprocessing/configs/label_mappings_{version}.json"
            )
            if not os.path.isfile(mapping_file):
                mapping_file = None
        self.noun_mapping = get_label_mapping(annots["all_nouns"].explode(), "noun", mapping_file)
        self.verb_mapping = get_label_mapping(annots["all_verbs"].explode(), "verb", mapping_file)

        split = load_split(annots, cfg["split"])
        train_df, val_df, test_df = apply_split(annots, split, cfg["split"])
        if self.debug:
            train_df = train_df.iloc[:2000]

        aug_cfg = cfg["aug"]
        self.aug = AugConfig(
            resize_spec=tuple(map(tuple, aug_cfg["resize_spec"]))
            if isinstance(aug_cfg["resize_spec"][0], (list, tuple))
            else tuple(aug_cfg["resize_spec"]),
            crop_spec=tuple(aug_cfg.get("crop_spec", (1, 1))),
            flip=aug_cfg.get("flip", True),
            channel_order=aug_cfg.get("channel_order", "RGB"),
            brightness=aug_cfg.get("brightness", 0.0),
            contrast=aug_cfg.get("contrast", 0.0),
            saturation=aug_cfg.get("saturation", 0.0),
            hue=aug_cfg.get("hue", 0.0),
            normalization=self.run.get("normalization", "ego4d_baseline"),
        )

        narr_args = self.run["narration_embeds"]["args"]
        lookup = build_narration_lookup(
            annots,
            narr_args.get("strategy", "current"),
            start_prompt=narr_args.get("start_prompt"),
            end_prompt=narr_args.get("end_prompt"),
            empty_prompt=narr_args.get("empty_prompt"),
            final_concat=narr_args.get("final_concat"),
        )

        frames_dir = os.path.join(root, "object_frames")
        uid_col = "video_uid" if cfg["dataset"]["name"].endswith("v2") else "video_id"
        verb_bg = self.run.get("verb_bg", False)
        # FrankMocap hand history for the transformer TTC head
        # (run.hand_args — ego_nao_data.py:48-50 wraps with HandPosDataset).
        hand_lookup = None
        hand_args = self.run.get("hand_args") or {}
        if hand_args.get("use"):
            from transfusion_tpu.data.hand_pose import HandPoseLookup

            hand_path = os.path.expandvars(hand_args.get("path", ""))
            if hand_path and os.path.isfile(hand_path):
                hand_lookup = HandPoseLookup(
                    hand_path, hand_args.get("num_steps", 5), hand_args.get("step", 5)
                )
            else:
                log.warning("hand_args.use set but cache %r missing; hand inputs zero-filled", hand_path)
                hand_lookup = _ZeroHandLookup(hand_args.get("num_steps", 5))

        # Precomputed narration vectors for the identity text tower (the
        # Embed/Sbert dataset variants); env NARR_EMBED_CACHE is a pickle of
        # {uid: vector}. Zero vectors keep the path runnable without it.
        narr_embed_lookup = None
        narr_embedder = None
        tp = narr_args.get("text_pooling", "sbert_finetune")
        if narr_args.get("type") == "glove":
            # Word-embedding-table variant (narration_embeddings.py:17-73):
            # $DATA/glove.6B.{size}d.txt pooled per narration string.
            from transfusion_tpu.data.glove import GloveNarrationEmbedder

            narr_embedder = GloveNarrationEmbedder.from_env(
                size=narr_args.get("size", 300),
                pooling=narr_args.get("pooling", "max"),
                normalize=narr_args.get("normalize", True),
            )
            if narr_embedder is None:
                narr_embed_lookup = {}
        elif narr_args.get("pooling") == "sbert" or tp not in (
            "sbert_finetune", "gpt2", "t5-wikihow"
        ):
            cache = os.environ.get("NARR_EMBED_CACHE", "")
            if cache and os.path.isfile(cache):
                import pickle

                with open(cache, "rb") as fp:
                    narr_embed_lookup = pickle.load(fp)
            else:
                log.warning("identity text tower without NARR_EMBED_CACHE; zero language_f")
                narr_embed_lookup = {}

        mk = lambda df: EgoNaoDataset(
            annots=df, frames_dir=frames_dir, noun_mapping=self.noun_mapping,
            verb_mapping=self.verb_mapping, aug=self.aug, narration_lookup=lookup,
            uid_col=uid_col, verb_bg=verb_bg, hand_pose_lookup=hand_lookup,
            narration_embedding_lookup=narr_embed_lookup,
            narration_embedding_dim=narr_args.get("size", 384),
            narration_embedder=narr_embedder,
        )
        self.train_ds, self.val_ds, self.test_ds = mk(train_df), mk(val_df), mk(test_df)
        self.num_nouns = self.train_ds.num_nouns
        self.num_verbs = self.train_ds.num_verbs

        cutoff = ds_args.get("label_cutoff", {})
        dampen_n = cutoff.get("dampen", cutoff.get("dampen_noun", 1.0))
        dampen_v = cutoff.get("dampen", cutoff.get("dampen_verb", 1.0))
        noun_w = balanced_class_weights(train_df["all_nouns"].explode(), self.noun_mapping, dampen_n)
        verb_w = balanced_class_weights(train_df["all_verbs"].explode(), self.verb_mapping, dampen_v)
        self.noun_w, self.verb_w = build_class_weights(
            noun_w, verb_w, self.run.get("bg_weight", 1), self.run.get("verb_bg", False),
            self.run.get("all_class_w", False),
        )
        freqs = noun_verb_frequencies(train_df, self.noun_mapping, self.verb_mapping)
        self.noun_verb_freqs = jnp.asarray(
            frequencies_to_array(freqs, self.num_nouns, self.num_verbs)
        )

        self.tokenizer = build_tokenizer(narr_args.get("model_v", "all-MiniLM-L12-v2"))
        type_names = tuple(narr_args.get("type_embeddings") or ())
        if type_names and hasattr(self.tokenizer, "encode_batch_with_types"):
            self.tokenizer.type_names = type_names

    # --------------------------------------------------------------- model
    def _set_stop_grad_stages(self, p: int):
        """Apply the epoch's frozen-prefix tape cut (see
        DetectorConfig.stop_grad_stages). Grad masking via
        unfreeze_multipliers stays authoritative — the cut only removes the
        already-masked backbone backward work — so updates are unchanged.
        Rebuilds the compiled steps when the prefix changes (at most once per
        train_ep / freeze_backbone_at_epoch trigger)."""
        if self.model_cfg.detector.stop_grad_stages == p:
            return
        from dataclasses import replace

        self.model_cfg = replace(
            self.model_cfg, detector=replace(self.model_cfg.detector, stop_grad_stages=p)
        )
        self.model = TransFusion(self.model_cfg)
        # The cut changes no parameter (stop_gradient is weightless), so the
        # live TrainState — possibly restored or mid-training — survives the
        # step rebuild (_build_steps resets self.state for the cold path).
        state = self.state
        self._build_steps()
        self.state = state

    def _build_model(self):
        # precision 16 -> bf16 compute (the TPU-stable replacement for the
        # reference's NaN-prone fp16, README.md:62); 32 -> f32.
        dtype = jnp.bfloat16 if int(self.run.get("precision", 32)) == 16 else jnp.float32
        self.model_cfg = build_transfusion_config(
            self.config, self.num_nouns, self.num_verbs, dtype=dtype
        )
        self.model = TransFusion(self.model_cfg)

        # Global batch sizes, rounded up to the data-axis multiple (short
        # batches are padded before sharding anyway).
        data_axis = self.mesh.shape["data"]
        rnd = lambda b: -(-max(b, 1) // data_axis) * data_axis
        self.train_bs = rnd(self.run["train_bs"])
        self.val_bs = rnd(self.run["val_bs"])
        if self.debug:
            self.train_bs = rnd(min(self.train_bs, 10))
            self.val_bs = rnd(min(self.val_bs, 10))

        steps_per_epoch = max(len(self.train_ds) // max(self.train_bs, 1), 1)
        self.tx, self.lr_schedule = make_optimizer(
            self.run["optimizer"],
            self.run.get("scheduler"),
            steps_per_epoch,
            grad_clip=self.run.get("grad_clip"),
            accumulate=self.run.get("accumulate_grad_batches", 1),
        )

        criterion = self.run["criterion"]
        self.loss_cfg = LossConfig(
            bbox_on=bool(criterion.get("bbox", 0)),
            obj_prop_on=bool(criterion.get("obj_prop", 0)),
            noun_on=bool(criterion.get("noun", 0)),
            verb_on=bool(criterion.get("verb", 0)),
            ttc_on=bool(criterion.get("ttc", 0)),
            lm_on=bool(criterion.get("lm", 0)),
            agg_mean=criterion.get("agg", "mean") == "mean",
            ttc_beta=criterion.get("ttc_beta", 1),
            verb_bg=self.run.get("verb_bg", False),
            ttc_bg=bool(self.run.get("ttc_bg", False)),
            ttc_bg_val=float(self.run.get("ttc_bg_val") or 0.0),
            rpn_batch_size_per_image=self.config["model"]["rcnn_kwargs"].get(
                "rpn_batch_size_per_image", 256
            ),
            last_noun_idx=self.num_nouns - 1,
        )
        self.criterion = criterion

    def _build_steps(self):
        # Donate the incoming state: the returned state replaces it, and the
        # freed params+moments buffers (~3x param bytes) are what lets XLA
        # avoid rematerializing the backward at flagship batch sizes.
        self.train_step = make_train_step(
            self.model, self.tx, self.loss_cfg, self.noun_w, self.verb_w, donate=True,
            # bf16 weight-grad path rides with bf16 compute (precision 16);
            # run.bf16_grads overrides either way (additive TPU knob).
            bf16_grads=bool(self.run.get("bf16_grads",
                                         self.model_cfg.dtype == jnp.bfloat16)),
        )
        self.eval_step = make_eval_step(
            self.model, self.model_cfg.detector, noun_verb_frequencies=self.noun_verb_freqs
        )
        # Combined detections + real val-loss program (the reference logs a
        # normalized-weight val loss whose per-term values are constant zeros,
        # ego_nao_trainer.py:407-427; here the terms are computed).
        self.eval_loss_step = make_eval_loss_step(
            self.model, self.model_cfg.detector, self.loss_cfg, self.noun_w, self.verb_w,
            noun_verb_frequencies=self.noun_verb_freqs,
        )
        self.val_loss_w = jnp.asarray(normalized_criterion_weights(self.criterion))
        self.state = None

    # ---------------------------------------------------------------- init
    def _example_batch(self, bucket):
        h, w = bucket
        b = self.mesh.shape["data"]
        lang = self.tokenizer.max_length
        return {
            "image": jnp.zeros((b, h, w, 3), jnp.float32),
            "input_ids": jnp.ones((b, lang), jnp.int32),
            "attention_mask": jnp.ones((b, lang), jnp.int32),
            "targets": {
                "boxes": jnp.tile(jnp.asarray([[10.0, 10.0, 50.0, 50.0]]), (b, 8, 1)).reshape(b, 8, 4),
                "nouns": jnp.ones((b, 8), jnp.int32),
                "verbs": jnp.ones((b, 8), jnp.int32),
                "ttcs": jnp.full((b, 8), 0.9, jnp.float32),
                "valid": jnp.concatenate([jnp.ones((b, 1), bool), jnp.zeros((b, 7), bool)], 1),
            },
            "image_hw": bucket,
        }

    def ensure_state(self, resume_from: str | None = None):
        if self.state is not None:
            return
        bucket = self.aug.buckets[0]
        with self.mesh:
            state = init_state(
                self.model, self.tx, self._example_batch(bucket), jax.random.key(self.seed)
            )
            # Apply the mesh placement: params replicated over 'data' and (for
            # --mesh-model > 1) large fusion/box-head matmuls sharded over
            # 'model'; re-initializing the optimizer on the placed params
            # propagates the same shardings into the moments, so the train
            # step is partitioned end-to-end (SURVEY §2.6).
            p_sh = param_shardings(self.mesh, state.params, fsdp=self.fsdp, tp_min_dim=self.tp_min_dim)
            params = jax.device_put(state.params, p_sh)
            opt_state = jax.jit(
                self.tx.init,
                out_shardings=opt_state_shardings(self.mesh, self.tx.init, params, p_sh),
            )(params)
            batch_stats = state.batch_stats
            if batch_stats is not None:
                from transfusion_tpu.parallel.mesh import replicated

                batch_stats = jax.device_put(batch_stats, replicated(self.mesh))
            self.state = state.replace(params=params, opt_state=opt_state, batch_stats=batch_stats)
        if not resume_from:
            # The reference initializes the RCNN from a translated detectron2
            # checkpoint at model build (model.pretrained ->
            # rcnn_factory.py:85-108). When resuming, the restore below
            # overwrites everything anyway (same net effect as the reference's
            # build-then-load_state_dict order), so skip the wasted work.
            pretrained = (self.config.get("model") or {}).get("pretrained")
            if isinstance(pretrained, str) and pretrained:
                self._load_pretrained_weights(pretrained)
            elif pretrained is True:
                log.warning(
                    "model.pretrained: True requests torchvision COCO weights "
                    "(a download); provide a translated checkpoint path instead "
                    "(tools/translate_checkpoint). Training from random init."
                )
            if not pretrained and not self.model_cfg.detector.trainable_bn:
                # Measured failure mode (round-4 overfit probe): FrozenBN is an
                # identity affine at random init, so the trunk is unnormalized —
                # RPN logits/deltas reach O(100) and the L1-family detector
                # losses then close that gap at ~lr per step (RPN box loss
                # plateaus, proposals never converge). FrozenBN only makes
                # sense over pretrained statistics.
                log.warning(
                    "training from RANDOM init with frozen BatchNorm: the trunk "
                    "is unnormalized and detector losses converge pathologically "
                    "slowly. Set model.batch_norm.use: True (trainable BN) or "
                    "provide model.pretrained."
                )
        if resume_from:
            self._check_tokenizer_provenance(resume_from)
            fresh = self.state.params
            # The template is already sharded, so restore places arrays
            # directly onto the mesh.
            self.state = self.ckpt.restore(self.state, path=resume_from)
            if self.run.get("replace_heads", False) == "all":
                self.state = self.state.replace(params=replace_heads(self.state.params, fresh))

    def _load_pretrained_weights(self, path: str):
        """Cold-start parameter init from pretrained detector weights
        (config key ``model.pretrained`` — the reference's standard flow,
        loading ``translated_ego4d{v2}.pth`` with key renames at model build,
        ``rcnn_factory.py:85-108``).

        Accepts either the reference torch ``.pth``/``.ckpt`` directly
        (translated in-process via tools/translate_checkpoint) or an orbax
        params directory that tool produced offline. ``model.load_fpn_rpn:
        False`` reverts fpn/rpn/roi weights to fresh init so only the encoder
        transfers (rcnn_factory.py:93-99)."""
        import numpy as np

        path = os.path.expandvars(path)
        fresh = jax.tree.map(np.asarray, self.state.params)
        if os.path.isdir(path):
            import orbax.checkpoint as ocp

            from transfusion_tpu.train.checkpoint import tolerant_merge

            self._check_tokenizer_provenance(path)
            restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
            merged = tolerant_merge(fresh, restored)
            log.info("pretrained init: restored orbax params from %s", path)
        elif os.path.isfile(path):
            import torch

            from transfusion_tpu.tools.translate_checkpoint import (
                translate_reference_checkpoint,
            )

            sd = torch.load(path, map_location="cpu", weights_only=False)
            merged, report = translate_reference_checkpoint(
                sd, fresh,
                fpn_features=tuple(self.model_cfg.fusion.fpn_features),
                patch_hw=tuple(
                    zip(self.model_cfg.fusion.patch_h, self.model_cfg.fusion.patch_w)
                ),
            )
            log.info(
                "pretrained init: translated %d tensors from %s (unmatched source %d)",
                report["translated"], path, len(report["unmatched_source"]),
            )
        else:
            raise FileNotFoundError(f"model.pretrained path not found: {path}")

        if not (self.config.get("model") or {}).get("load_fpn_rpn", True):
            rcnn_m = merged.get("rcnn", merged)
            rcnn_f = fresh.get("rcnn", fresh)
            for key in ("fpn", "rpn_head", "box_head", "predictors"):
                if key in rcnn_m:
                    rcnn_m[key] = rcnn_f[key]
            log.info("pretrained init: load_fpn_rpn False — fpn/rpn/roi heads stay fresh")

        p_sh = param_shardings(self.mesh, self.state.params, fsdp=self.fsdp, tp_min_dim=self.tp_min_dim)
        merged = jax.tree.map(
            lambda new, old: np.asarray(new, dtype=old.dtype), merged, fresh
        )
        self.state = self.state.replace(params=jax.device_put(merged, p_sh))

    def _check_tokenizer_provenance(self, resume_from: str):
        """Fail loudly when a checkpoint carrying PRETRAINED language-tower
        weights (translate_checkpoint provenance sidecar) is restored while
        the active tokenizer is a hash fallback: the tower would see garbage
        token ids with no error otherwise."""
        prov_path = os.path.abspath(resume_from).rstrip("/") + ".provenance.json"
        if not os.path.isfile(prov_path):
            return
        with open(prov_path) as fp:
            prov = json.load(fp)
        if (
            prov.get("pretrained_language_tower")
            and getattr(self.tokenizer, "is_hash_fallback", False)
            and self.model_cfg.text_encoder != "identity"
        ):
            raise RuntimeError(
                f"checkpoint {resume_from!r} carries pretrained language-tower "
                "weights but the active tokenizer is a hash fallback (no vocab "
                "files found) — token ids would be garbage. Provide the real "
                "vocab via TOKENIZER_VOCAB / GPT2_VOCAB_JSON+GPT2_MERGES / "
                "T5_SPM (or TOKENIZER_DIR) and retry."
            )

    # ---------------------------------------------------------------- train
    def _device_batch(self, batch, with_targets=True):
        model_batch = {
            "image": batch["image"],
            "input_ids": batch["input_ids"],
            "attention_mask": batch["attention_mask"],
        }
        for extra in ("visual_features", "hand_boxes", "hand_poses", "type_mask", "language_f"):
            if extra in batch:
                model_batch[extra] = batch[extra]
        if with_targets and "targets" in batch:
            t = batch["targets"]
            model_batch["targets"] = {
                "boxes": t["boxes"],
                "nouns": t["nouns"],
                "verbs": t["verbs"],
                "ttcs": t["ttcs"],
                "valid": t["valid"],
            }
        # Pad the batch dim to a multiple of the data axis before sharding
        # (short final eval batches; padded rows are dropped host-side).
        data_axis = self.mesh.shape["data"]
        bsz = model_batch["image"].shape[0]
        pad = (-bsz) % data_axis

        def prep(x):
            x = np.asarray(x)
            if pad:
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
            return x

        return shard_batch(self.mesh, jax.tree.map(prep, model_batch))

    def train_epoch(self, epoch: int) -> dict:
        self._set_stop_grad_stages(backbone_stop_grad_stages(
            epoch, self.config["model"], self.run.get("freeze_backbone_at_epoch", -1)))
        self.ensure_state()
        loader = DataLoader(
            self.train_ds, self.train_bs, tokenizer=self.tokenizer, training=True,
            seed=self.seed, shard_index=jax.process_index(), num_shards=jax.process_count(),
            lang_max_length=self.tokenizer.max_length,
        )
        loader.epoch = epoch

        # 6-slot criterion weights with the per-epoch lm / obj_prop decays
        # (see train/step.criterion_weights).
        loss_w = criterion_weights(self.criterion, epoch)

        te = self.model_cfg.text_encoder
        narr_layers = {
            "gpt2": getattr(self.model_cfg.gpt2, "num_layers", 0),
            "t5": getattr(self.model_cfg.t5, "num_layers", 0),
        }.get(te, self.model_cfg.bert.num_layers)
        mult = unfreeze_multipliers(
            self.state.params, epoch, self.config["model"],
            self.run["narration_embeds"]["args"].get("train_ep", -1),
            self.run["narration_embeds"]["args"].get("finetune_layers", 1),
            narr_layers,
            self.run.get("freeze_backbone_at_epoch", -1),
            text_encoder=te,
        )

        agg = {}
        n_steps = 0
        t0 = time.time()
        rng = jax.random.key(self.seed + 1)
        with self.mesh:
            for batch in loader:
                db = self._device_batch(batch)
                self.state, metrics = self.train_step(
                    self.state, db, rng, jnp.asarray(loss_w), tuple(batch["image_hw"]), mult
                )
                n_steps += 1
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
        if agg.get("nonfinite_skipped", 0.0) > 0:
            log.warning(
                "epoch %d: %d non-finite steps were skipped (NaN guard)",
                epoch, int(agg["nonfinite_skipped"]),
            )
        out = {f"train_{k}": v / max(n_steps, 1) for k, v in agg.items()}
        out["train_steps"] = n_steps
        out["train_time_s"] = round(time.time() - t0, 1)
        # Input vs step accounting: is the host pipeline the wall?
        if loader.decode_times:
            out["train_decode_s_per_batch"] = round(float(np.mean(loader.decode_times)), 4)
        out["train_s_per_batch"] = round((time.time() - t0) / max(n_steps, 1), 4)
        loader.close()
        log.info("epoch %d train: %s", epoch, {k: round(v, 4) for k, v in out.items()})
        return out

    # ----------------------------------------------------------------- eval
    def _process_count(self) -> int:
        return jax.process_count()

    def _process_index(self) -> int:
        return jax.process_index()

    def evaluate(self, epoch: int, dataset=None, source="val", export=True) -> EvalResult:
        self.ensure_state()
        ds = dataset if dataset is not None else self.val_ds
        loader = DataLoader(
            ds, self.val_bs, tokenizer=self.tokenizer, training=False,
            seed=self.seed, shard_index=self._process_index(), num_shards=self._process_count(),
            lang_max_length=self.tokenizer.max_length, drop_last=False,
        )
        metric = STAMeanAveragePrecision(top_k=5)
        pairs: list = []  # (preds, labels) per image, fused across hosts
        loss_agg: dict = {}
        loss_batches = 0
        results: dict = {}
        bucket = self.aug.eval_bucket()
        first_plot = None
        cap_inexact_images = 0  # pre-NMS cap exactness diagnostic (roi_heads)
        with self.mesh:
            for batch in loader:
                db = self._device_batch(batch, with_targets=True)
                dets, losses = self.eval_loss_step(
                    self.state.params, db, self.val_loss_w, tuple(bucket),
                    self.state.batch_stats,
                )
                dets = jax.device_get(dets)
                if "pre_nms_missed" in dets:
                    # The cap is exact unless candidates were dropped AND the
                    # keep cap stayed unfilled (RoIConfig.pre_nms_candidates).
                    kept = dets["valid"].sum(axis=1)
                    cap_inexact_images += int(
                        ((dets["pre_nms_missed"] > 0) & (kept < dets["valid"].shape[1])).sum()
                    )
                for k, v in losses.items():
                    loss_agg[k] = loss_agg.get(k, 0.0) + float(v)
                loss_batches += 1
                n_real = len(batch["uids"])
                if first_plot is None and self.plotter is not None:
                    first_plot = (
                        {"image": np.asarray(batch["image"][:8]), "targets": batch["targets"]},
                        jax.tree.map(lambda x: np.asarray(x[:8]), dets),
                    )
                # host: metric + export (boxes back to original resolution).
                for i in range(n_real):
                    v = dets["valid"][i]
                    ry = batch["orig_hw"][i][0] / bucket[0]
                    rx = batch["orig_hw"][i][1] / bucket[1]
                    # Float boxes end-to-end: the logged metric must score the
                    # same coordinates the exported JSON carries (export.py
                    # keeps floats; the official evaluator takes floats too).
                    pred_boxes = dets["boxes"][i][v] * np.array([rx, ry, rx, ry])
                    preds = {
                        "boxes": pred_boxes,
                        "scores": dets["scores"][i][v],
                        "nouns": dets["nouns"][i][v],
                        "verbs": dets["verbs"][i][v],
                        "ttcs": dets["ttcs"][i][v],
                    }
                    t = batch["targets"]
                    gv = t["valid"][i]
                    sy = batch["orig_hw"][i][0] / batch["image"].shape[1]
                    sx = batch["orig_hw"][i][1] / batch["image"].shape[2]
                    labels = {
                        "boxes": t["boxes"][i][gv] * np.array([sx, sy, sx, sy]),
                        "nouns": t["nouns"][i][gv],
                        "verbs": t["verbs"][i][gv],
                        "ttcs": t["ttcs"][i][gv],
                    }
                    pairs.append((preds, labels))
                results.update(
                    detections_to_results(
                        jax.tree.map(lambda x: x[:n_real], dets),
                        batch["uids"], batch["orig_hw"], bucket,
                        last_noun_idx=self.num_nouns - 1,
                    )
                )

        loader.close()
        if cap_inexact_images:
            log.warning(
                "pre-NMS candidate cap exactness precondition broke on %d image(s) "
                "(above-threshold candidates dropped while the keep cap was "
                "unfilled); raise RoIConfig.pre_nms_candidates to make the "
                "postprocess exact", cap_inexact_images,
            )
        # and result entries, so the logged metric is exact and process 0
        # writes the FULL prediction JSON — the fix for the caveat the
        # reference only documents (README.md:59 partial per-rank metrics).
        if self._process_count() > 1:
            shards = allgather_pyobj((pairs, results), self._process_count())
            pairs = [p for shard_pairs, _ in shards for p in shard_pairs]
            results = {k: v for _, shard_results in shards for k, v in shard_results.items()}
        for preds, labels in pairs:
            metric.add(preds, labels)
        values = metric.evaluate()
        metrics = {f"{name}_{source}": v for name, v in zip(metric.get_short_names(), values)}
        # Real per-term validation losses under the normalized weight vector
        # (the reference's weighting, applied to computed — not zero — terms).
        for k, v in loss_agg.items():
            metrics[f"{source}_{k}"] = v / max(loss_batches, 1)
        log.info("epoch %d %s: %s", epoch, source, {k: round(v, 3) for k, v in metrics.items()})

        self.last_plot_path = None
        if first_plot is not None:
            try:
                # Path kept for fit() to mirror into wandb (the reference logs
                # the GT-vs-prediction grids per epoch, callbacks.py:276-329).
                self.last_plot_path = self.plotter(source, epoch, first_plot[0], first_plot[1])
            except Exception as e:  # plotting must never break eval
                log.warning("plot callback failed: %s", e)

        path = None
        if export and (self._process_count() == 1 or self._process_index() == 0):
            path = os.path.join(
                self.run_dir, "results", f"{source}_epoch{epoch}.json"
            )
            write_result_json(results, path, epoch=epoch)
        return EvalResult(metrics=metrics, result_json_path=path)

    def make_detect_fn(self, score_thresh: float | None = None, resume_from: str | None = None):
        """Plain-detector closure for offline tools — the role UniDet plays in
        the reference's label-extraction sweep (label_extraction.py:92-125).

        Returns ``detect(images)`` taking a list/array of uint8 RGB HWC
        frames and returning, per frame, ``(class_ids, scores, xyxy boxes)``
        in ORIGINAL frame coordinates, thresholded at ``score_thresh``.
        Narration input is empty (the sweep runs the detector standalone).
        """
        self.ensure_state(resume_from=resume_from)
        from transfusion_tpu.data.transforms import transform_example

        bucket = tuple(self.aug.eval_bucket())
        rng = np.random.default_rng(0)  # unused on the eval path
        empty = np.zeros((0, 4), np.float32)

        def detect(images):
            n = len(images)
            ims, scales = [], []
            for img in images:
                oh, ow = img.shape[:2]
                im, _ = transform_example(rng, np.asarray(img), empty, self.aug,
                                          bucket, training=False)
                ims.append(im)
                scales.append((ow / bucket[1], oh / bucket[0]))
            ids, mask = self.tokenizer.encode_batch([""] * n)
            db = self._device_batch(
                {"image": np.stack(ims), "input_ids": ids, "attention_mask": mask},
                with_targets=False,
            )
            dets = jax.device_get(
                self.eval_step(self.state.params, db, bucket, self.state.batch_stats)
            )
            out = []
            for i in range(n):
                v = dets["valid"][i]
                if score_thresh is not None:
                    v = v & (dets["scores"][i] >= score_thresh)
                sx, sy = scales[i]
                boxes = dets["boxes"][i][v] * np.array([sx, sy, sx, sy], np.float32)
                out.append((dets["nouns"][i][v], dets["scores"][i][v], boxes))
            return out

        return detect

    # ------------------------------------------------------------------ fit
    def fit(self, epochs: int | None = None, resume_from: str | None = None,
            wandb_run=None, wandb_module=None, log_checkpoints: bool = True):
        """Train for ``epochs``. When ``wandb_run`` is given, scalars are
        logged LIVE per epoch and each epoch's checkpoint is uploaded as the
        ``model-<run_id>`` artifact (auto-versioned vN — the address
        ``wandb_resume.resolve_resume`` downloads), with result JSONs attached
        as ``results-<run_id>`` — the upload side of the reference's system of
        record (WandbLogger(log_model="all") run_experiment.py:340, per-epoch
        result artifacts ego_nao_trainer.py:250). ``log_checkpoints=False``
        implements --do-not-log-checkpoints."""
        epochs = epochs if epochs is not None else self.run["epochs"]
        self.ensure_state(resume_from)
        val_every = max(int(self.run.get("val_every", 1.0)), 1)
        if wandb_run is not None and wandb_module is None:
            import wandb as wandb_module  # type: ignore[no-redef]
        best = None
        for epoch in range(epochs):
            train_metrics = self.train_epoch(epoch)
            record = {"epoch": epoch, **train_metrics}
            result = None
            if (epoch + 1) % val_every == 0:
                result = self.evaluate(epoch)
                record.update(result.metrics)
            ckpt_path = self.ckpt.save(epoch, self.state, metrics=record)
            # Best-checkpoint pointer named by the monitored metric (the
            # reference names checkpoint files by it, factories.py:36-59).
            mval = record.get(self.monitor)
            if mval is not None and (best is None or mval > best["value"]):
                best = {"metric": self.monitor, "value": float(mval),
                        "epoch": epoch, "path": ckpt_path}
                with open(os.path.join(self.ckpt.dir, "best.json"), "w") as fp:
                    json.dump(best, fp, indent=1)
            self.history.append(record)
            with open(os.path.join(self.run_dir, "history.jsonl"), "a") as fp:
                fp.write(json.dumps(record) + "\n")
            if wandb_run is not None and self._process_index() == 0:
                wandb_run.log(record, step=epoch)
                plot = getattr(self, "last_plot_path", None)
                if result is not None and plot and os.path.isfile(plot) and \
                        hasattr(wandb_module, "Image"):
                    # Mirror the epoch's GT-vs-prediction grid (the reference's
                    # BboxPlotterCallback wandb images, callbacks.py:276-329).
                    wandb_run.log({"plots/val": wandb_module.Image(plot)}, step=epoch)
                if log_checkpoints:
                    self.ckpt.wait()  # orbax saves async; artifact needs files
                    art = wandb_module.Artifact(f"model-{wandb_run.id}", type="model")
                    art.add_dir(ckpt_path)
                    wandb_run.log_artifact(art)
                if result is not None and result.result_json_path:
                    art = wandb_module.Artifact(f"results-{wandb_run.id}", type="result")
                    art.add_file(result.result_json_path)
                    wandb_run.log_artifact(art)
        self.ckpt.wait()
        return self.history
