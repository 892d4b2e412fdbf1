"""Fingerprint generation: the main user-facing pipeline.

Reference parity: fingerprint/fingerprint.go —
  GenerateFingerprint (:137-236): content detect -> per-content config ->
  extractor -> STFT -> features -> AudioFingerprint{ID (sha256 of
  time+len+rate, utils.go:21-28), URL, content type, duration,
  sample rate, hop size, channels, features, metadata (utils.go:30-58)};
  defaults window 2048 / hop 512 (:70-98).

TPU flow: one H2D upload of the PCM, then the whole extractor runs as a
single jitted device program (extractors/programs.py) — per-clip and
batched paths share that program, so `generate_fingerprints_batch`
equals per-clip `generate_fingerprint` by construction while sustaining
the batched pipeline's throughput (bench.py `[bench] generate-batch`).
"""

from __future__ import annotations

import functools
import hashlib
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.config.config import ContentType, FingerprintConfig, default_fingerprint_config
from sonido_sonar_tpu.config.content_config import ContentAwareConfigManager
from sonido_sonar_tpu.extractors.base import FeatureExtractorFactory
from sonido_sonar_tpu.extractors.features import ExtractedFeatures
from sonido_sonar_tpu.fingerprint.content_detector import ContentDetector
from sonido_sonar_tpu.io.audio import AudioData
from sonido_sonar_tpu.logging import get_global_logger
from sonido_sonar_tpu.ops.stft import stft


@dataclass
class AudioFingerprint:
    """AudioFingerprint (fingerprint.go:14-26)."""

    id: str
    stream_url: str
    content_type: ContentType
    timestamp: float
    duration: float
    sample_rate: int
    hop_size: int
    channels: int
    features: ExtractedFeatures
    metadata: Dict[str, Any] = field(default_factory=dict)


def generate_id(audio: AudioData) -> str:
    """utils.go:21-28: sha256(time_ns, len, rate)[:16]."""
    h = hashlib.sha256(
        f"{time.time_ns()}_{len(audio.pcm)}_{audio.sample_rate}".encode()
    )
    return h.hexdigest()[:16]


@functools.lru_cache(maxsize=64)
def _stack_program(b: int, n: int):
    """Jitted [b x [n]] -> [b, n] stack, cached per geometry (one
    compiled dispatch instead of b+1 eager concatenate ops)."""
    return jax.jit(lambda xs: jnp.stack(xs).astype(jnp.float32))


@functools.lru_cache(maxsize=64)
def _restore_order_program(group_sizes: Tuple[int, ...]):
    """Jitted multi-group clip-order restore: slice each group's pack
    to its true size (bucket pad rows dropped), concatenate, and gather
    back to input order — ONE dispatch instead of an eager op chain."""

    def run(packs, inv):
        trimmed = [p[:g] for p, g in zip(packs, group_sizes)]
        return jnp.concatenate(trimmed)[inv]

    return jax.jit(run)


@dataclass
class FingerprintBatch:
    """Device-resident result of `generate_fingerprints_batch(
    materialize=False)`.

    The per-group feature pytrees stay ON DEVICE ([G, ...] leaves) so
    corpus-scale pipelines (device comparator packing, batched
    alignment) consume them without a host round trip — through the
    remote-tunnel environment a full-feature device->host fetch is the
    single most expensive step of the public path, and on any hardware
    it is wasted work when the next consumer is another device program.

    `fingerprints` carries the complete per-clip metadata (IDs, content
    types, stream info) with `features=None` until `materialize()`
    pulls each group's pytree with ONE `jax.device_get` and attaches
    per-clip numpy views.
    """

    fingerprints: List[AudioFingerprint]
    groups: List[Tuple[ContentType, List[int], ExtractedFeatures]]

    def materialize(self) -> List[AudioFingerprint]:
        """Fill every fingerprint's `features` (one device_get per
        group, numpy views per clip) and return the list."""
        for _, idxs, features in self.groups:
            g = len(idxs)
            leaves = jax.tree_util.tree_leaves(features)
            if leaves and leaves[0].shape[0] != g:  # drop pad rows on device
                features = jax.tree_util.tree_map(lambda x: x[:g], features)
            feats_np = jax.device_get(features)
            for pos, i in enumerate(idxs):
                self.fingerprints[i].features = jax.tree_util.tree_map(
                    lambda x, p=pos: x[p], feats_np
                )
        return self.fingerprints

    def comparator_matrix(self, num_mfcc_coeffs: int = 13):
        """Device-side packed comparator statistics [B, D] in the
        `device_compare` layout — the corpus-ready output without the
        features ever leaving the device. Row order matches
        `fingerprints`.

        Dispatch-lean (round-5 stage trace: the eager concat + identity
        gather here were most of an 84 ms pack stage through the
        ~30 ms-round-trip tunnel): the single-group case — every clip
        one content type, the common corpus shape — is exactly the pack
        program's output (its group is already in clip order), and the
        multi-group restore is one jitted slice+concat+gather program.
        The result is cached per num_mfcc_coeffs (features are
        immutable device arrays)."""
        cached = getattr(self, "_cm_cache", None)
        if cached is not None and cached[0] == num_mfcc_coeffs:
            return cached[1]
        from sonido_sonar_tpu.fingerprint.device_compare import (
            pack_comparator_stats_batch,
        )

        packs = [
            pack_comparator_stats_batch(features, num_mfcc_coeffs)
            for _, _, features in self.groups
        ]
        if len(packs) == 1:
            g = len(self.groups[0][1])
            out = packs[0] if packs[0].shape[0] == g else packs[0][:g]
        else:
            order = np.concatenate(
                [np.asarray(idxs, np.int64) for _, idxs, _ in self.groups]
            )
            sizes = tuple(len(idxs) for _, idxs, _ in self.groups)
            inv = jnp.asarray(np.argsort(order))
            out = _restore_order_program(sizes)(tuple(packs), inv)
        object.__setattr__(self, "_cm_cache", (num_mfcc_coeffs, out))
        return out


class FingerprintGenerator:
    """FingerprintGenerator (fingerprint.go:28-135)."""

    def __init__(
        self,
        config: Optional[FingerprintConfig] = None,
        strict_reference_routing: bool = True,
    ):
        self.config = config or default_fingerprint_config()
        self.content_manager = ContentAwareConfigManager(self.config)
        self.content_detector = ContentDetector(self.config.content_aware)
        self.extractor_factory = FeatureExtractorFactory(strict_reference_routing)
        self._log = get_global_logger().with_component("fingerprint_generator")
        # speculative-routing memory: the detected type of the last
        # all-one-type batch (None after a mixed batch / cold start)
        self._spec_ct: Optional[ContentType] = None

    def _detect_content_type(self, audio: AudioData) -> ContentType:
        """Content detection cascade: explicit metadata -> acoustic ->
        UNKNOWN (fingerprint.go:149-170)."""
        content_type = ContentType.UNKNOWN
        if audio.metadata is not None:
            explicit = audio.metadata.extra.get("content_type", "")
            if explicit:
                from sonido_sonar_tpu.config.config import to_content_type

                content_type = to_content_type(explicit)
        if (
            content_type == ContentType.UNKNOWN
            and self.config.content_aware.enable_content_detection
        ):
            content_type = self.content_detector.detect_content_type(audio)
        return content_type

    def _detect_content_types_batch(
        self, audios, pcm_all: jnp.ndarray
    ) -> List[ContentType]:
        """_detect_content_type over a batch: explicit metadata on host,
        then ONE device program + [K, 9] fetch for the acoustic stage
        (content_detector.detect_batch) instead of per-clip host numpy."""
        resolve, _ = self._detect_content_types_batch_async(audios, pcm_all)
        return resolve()

    def _detect_content_types_batch_async(self, audios, pcm_all: jnp.ndarray):
        """Dispatch half of `_detect_content_types_batch`: the acoustic
        device program is launched but its [K, 9] fetch waits until the
        returned `resolve()` runs. Returns (resolve, dispatched);
        `dispatched=False` means resolve() is fetch-free (all explicit
        metadata / detection disabled). Lets the batch path put a
        speculative extractor dispatch between the two halves so the
        detect round trip rides under extractor device time."""
        from sonido_sonar_tpu.config.config import to_content_type

        ctypes: List[ContentType] = []
        pending: List[int] = []
        for i, a in enumerate(audios):
            ct = ContentType.UNKNOWN
            if a.metadata is not None:
                explicit = a.metadata.extra.get("content_type", "")
                if explicit:
                    ct = to_content_type(explicit)
            ctypes.append(ct)
            if (
                ct == ContentType.UNKNOWN
                and self.config.content_aware.enable_content_detection
            ):
                pending.append(i)
        inner = None
        if pending:
            if len(pending) == len(audios):
                sub = pcm_all
            else:
                sub = pcm_all[jnp.asarray(pending)]
            inner, dispatched = self.content_detector.detect_batch_async(
                [audios[i] for i in pending], pcm_device=sub
            )

        def resolve() -> List[ContentType]:
            if inner is not None:
                for i, ct in zip(pending, inner()):
                    ctypes[i] = ct
            return ctypes

        return resolve, (inner is not None and dispatched)

    def _feature_config_for(self, content_type: ContentType, sample_rate: int):
        generation_config = self.content_manager.get_generation_config(
            content_type
        )
        # the base config's geometry wins (fingerprint.go:180-186)
        return generation_config.feature_config.with_(
            window_size=self.config.feature_config.window_size,
            hop_size=self.config.feature_config.hop_size,
            sample_rate=sample_rate,
        )

    def _extract(self, extractor, pcm: jnp.ndarray, fc, sample_rate: int):
        """One extractor invocation: the single-program fast path when
        the extractor provides it, else the composition over an XLA
        spectrogram (sports/mixed)."""
        if hasattr(extractor, "extract_features_from_pcm"):
            return extractor.extract_features_from_pcm(pcm, sample_rate)
        spectrogram = stft(
            pcm, fc.window_size, fc.hop_size, fc.window_type, sample_rate
        )
        return extractor.extract_features(spectrogram, pcm, sample_rate)

    def generate_fingerprint(self, audio: AudioData) -> AudioFingerprint:
        """GenerateFingerprint (fingerprint.go:137-236)."""
        if audio is None or len(audio.pcm) == 0:
            raise ValueError("audio data cannot be empty")

        content_type = self._detect_content_type(audio)
        fc = self._feature_config_for(content_type, audio.sample_rate)
        extractor = self.extractor_factory.create_extractor(content_type, fc)

        pcm = (
            audio.pcm
            if isinstance(audio.pcm, jnp.ndarray)
            else jnp.asarray(np.asarray(audio.pcm, dtype=np.float32))
        )
        features = self._extract(extractor, pcm, fc, audio.sample_rate)

        fp = AudioFingerprint(
            id=generate_id(audio),
            stream_url=audio.metadata.url if audio.metadata else "",
            content_type=content_type,
            timestamp=time.time(),
            duration=audio.duration,
            sample_rate=audio.sample_rate,
            hop_size=self.config.feature_config.hop_size,
            channels=audio.channels,
            features=features,
            metadata={},
        )
        self._add_metadata(fp, audio, extractor)
        return fp

    def _assemble_fp(
        self, audio: AudioData, ct: ContentType, sr: int, extractor, features
    ) -> AudioFingerprint:
        """Host fingerprint-object assembly for one clip of a batch
        group (features stay the group's device pytree; `features=None`
        on the object until materialize)."""
        fp = AudioFingerprint(
            id=generate_id(audio),
            stream_url=audio.metadata.url if audio.metadata else "",
            content_type=ct,
            timestamp=time.time(),
            duration=audio.duration,
            sample_rate=sr,
            hop_size=self.config.feature_config.hop_size,
            channels=audio.channels,
            features=None,
            metadata={},
        )
        self._add_metadata(fp, audio, extractor, features)
        return fp

    def _prepare_batch(self, audios, pcm_matrix=None) -> jnp.ndarray:
        """Validate and stack a batch to one [B, N] device array (a
        single H2D upload; pre-uploaded device PCM passes through).

        pcm_matrix: optional pre-stacked [B, N] array (device or host) —
        validated against the batch and used as-is, skipping the stack
        entirely (the zero-copy fast path for corpus pipelines that
        already hold the batch as one tensor; fingerprint.batch_audios
        produces padded buckets in this form, so clips may be SHORTER
        than N — row i must hold audios[i].pcm zero-padded to N)."""
        sr = audios[0].sample_rate
        n = len(audios[0].pcm)
        for a in audios:
            if a is None or len(a.pcm) == 0:
                raise ValueError("audio data cannot be empty")
            if a.sample_rate != sr:
                raise ValueError(
                    "generate_fingerprints_batch requires same-rate clips; "
                    "group upstream (fingerprint.batch_audios)"
                )
            if pcm_matrix is None and len(a.pcm) != n:
                raise ValueError(
                    "generate_fingerprints_batch requires equal-length "
                    "clips; group or pad upstream "
                    "(fingerprint.batch_audios buckets a mixed corpus)"
                )
        if pcm_matrix is not None:
            if pcm_matrix.ndim != 2 or pcm_matrix.shape[0] != len(audios) \
                    or any(len(a.pcm) > pcm_matrix.shape[1] for a in audios):
                raise ValueError(
                    f"pcm_matrix shape {tuple(pcm_matrix.shape)} does not "
                    f"cover the batch (need [{len(audios)}, >=max clip len])"
                )
            if isinstance(pcm_matrix, jnp.ndarray):
                return pcm_matrix.astype(jnp.float32)
            return jnp.asarray(np.asarray(pcm_matrix, dtype=np.float32))
        if isinstance(audios[0].pcm, jnp.ndarray):
            # ONE jitted stack program: an eager jnp.stack over B
            # per-clip device rows dispatches ~B+1 ops through the
            # remote tunnel (~72 ms at B=128, round-5 stage breakdown)
            return _stack_program(len(audios), n)(
                tuple(a.pcm for a in audios)
            )
        return jnp.asarray(
            np.stack([np.asarray(a.pcm, dtype=np.float32) for a in audios])
        )

    def generate_fingerprints_batch(
        self, audios, materialize: bool = True, pcm_matrix=None,
        speculate: bool = True,
    ):
        """Batched GenerateFingerprint for same-rate, equal-length clips.

        The whole extractor program runs ONCE per content-type group on
        a stacked [B, N] device tensor (the same single-program path
        `generate_fingerprint` uses, so batch == per-clip), with content
        detection batched through one device program. Clips of differing
        lengths or rates must be grouped/padded by the caller (fixed
        shapes, SURVEY hard-part #2).

        materialize=True (default): returns List[AudioFingerprint] with
        host-numpy features (ONE jax.device_get per content group, then
        per-clip numpy views — no per-clip device slicing).
        materialize=False: returns a FingerprintBatch whose features
        stay on device for corpus pipelines (device comparator packing,
        batched alignment); call .materialize() for the list form.

        pcm_matrix: optional pre-stacked [B, N] array holding the same
        PCM as `audios` (row i == audios[i].pcm) — skips the stack
        program entirely (utils.batch_audios produces buckets in this
        form).

        speculate: overlap the content-detect fetch with the extractor
        program. When the LAST batch through this generator detected one
        uniform content type, the extractor for that type is dispatched
        BEFORE the detect result is fetched, so the ~40 ms detect round
        trip (round-5 stage breakdown, docs/PERF.md) rides under the
        extractor's device time. Results are identical either way: if
        detection disagrees with the speculation the speculative run is
        discarded and the normal per-group path executes (one wasted
        extractor program — only possible when the corpus content type
        CHANGES between consecutive batches; streaming corpora are
        uniform). Set speculate=False to never risk the wasted program.
        """
        if not audios:
            return [] if materialize else FingerprintBatch([], [])
        sr = audios[0].sample_rate
        pcm_all = self._prepare_batch(audios, pcm_matrix)
        resolve, dispatched = self._detect_content_types_batch_async(
            audios, pcm_all
        )
        spec_ct = self._spec_ct if (speculate and dispatched) else None
        spec_features = None
        if spec_ct is not None:
            fc_s = self._feature_config_for(spec_ct, sr)
            ext_s = self.extractor_factory.create_extractor(spec_ct, fc_s)
            # async dispatch: the chip starts the extractor while the
            # detect fetch's round trip is still in flight
            spec_features = self._extract(ext_s, pcm_all, fc_s, sr)
        ctypes = resolve()
        uniform_ct = ctypes[0] if all(c == ctypes[0] for c in ctypes) else None
        self._spec_ct = uniform_ct

        fingerprints: List[Optional[AudioFingerprint]] = [None] * len(audios)
        groups: List[Tuple[ContentType, List[int], ExtractedFeatures]] = []
        for ct in dict.fromkeys(ctypes):  # preserve first-seen order
            idxs = [i for i, c in enumerate(ctypes) if c == ct]
            fc = self._feature_config_for(ct, sr)
            extractor = self.extractor_factory.create_extractor(ct, fc)
            if len(idxs) == len(audios):
                if spec_features is not None and ct == spec_ct:
                    features = spec_features  # speculation confirmed
                    groups.append((ct, idxs, features))
                    for i in idxs:
                        fp = self._assemble_fp(audios[i], ct, sr, extractor,
                                               features)
                        fingerprints[i] = fp
                    continue
                pcm = pcm_all
            else:
                # pad the group to the next power of two (repeating row
                # 0 — every op is batch-element independent, so pad rows
                # are inert): group sizes vary run to run with detected
                # content, and each DISTINCT size is a fresh XLA compile
                # of the whole extractor program. Bucketing bounds the
                # variants to log2(B) per content config.
                g = len(idxs)
                gp = min(1 << (g - 1).bit_length(), len(audios))
                take = idxs + [idxs[0]] * (gp - g)
                pcm = pcm_all[jnp.asarray(take)]
            features = self._extract(extractor, pcm, fc, sr)
            groups.append((ct, idxs, features))
            for i in idxs:
                fingerprints[i] = self._assemble_fp(
                    audios[i], ct, sr, extractor, features
                )

        batch = FingerprintBatch(fingerprints, groups)
        if materialize:
            return batch.materialize()
        return batch

    def generate_fingerprints_mixed(self, audios) -> List[AudioFingerprint]:
        """GenerateFingerprint over ANY corpus — mixed lengths, mixed
        sample rates — restoring input order (the reference API takes
        any clip, fingerprint.go:137; fixed TPU shapes are handled by
        power-of-two bucketing, fingerprint/batching.batch_audios).

        Each bucket runs the batched path on its padded [G, N] matrix;
        zero padding only extends a clip's silent tail (see
        batching.py's padding-semantics note). Fingerprint metadata
        (duration, IDs) reflects the original clips.
        """
        from sonido_sonar_tpu.fingerprint.batching import batch_audios

        out: List[Optional[AudioFingerprint]] = [None] * len(audios)
        for bucket in batch_audios(audios):
            fps = self.generate_fingerprints_batch(
                bucket.audios, pcm_matrix=bucket.pcm_matrix
            )
            for i, fp in zip(bucket.indices, fps):
                out[i] = fp
        return out

    def _add_metadata(
        self, fp: AudioFingerprint, audio: AudioData, extractor,
        batched_features: Optional[ExtractedFeatures] = None,
    ) -> None:
        """utils.go:30-58. Feature stats read static SHAPES only, so the
        batched path passes its [G, ...] pytree and nothing is fetched."""
        fp.metadata["extractor_name"] = extractor.get_name()
        fp.metadata["feature_weights"] = extractor.get_feature_weights()
        fp.metadata["generation_time"] = time.time()
        if audio.metadata is not None:
            fp.metadata["stream_metadata"] = audio.metadata
        src = batched_features if batched_features is not None else fp.features
        stats: Dict[str, Any] = {}
        if src is not None:
            if src.mfcc is not None:
                stats["mfcc_frames"] = int(src.mfcc.shape[-2])
                stats["mfcc_coefficients"] = int(src.mfcc.shape[-1])
            if src.spectral_features is not None:
                stats["spectral_frames"] = int(
                    src.spectral_features.spectral_centroid.shape[-1]
                )
        fp.metadata["feature_stats"] = stats
