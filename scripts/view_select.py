"""Produce the question->best-view mapping (i2tfile) with BLIP-ITM on TPU.

Equivalent of the reference ``eval_scene_best_views.py`` driver: compose
declarative rewrites of the questions (``compose_decl_from_qa.py``), encode
every scene frame + declaration with BLIP-ITM (itc mode), rank frames per
question by cosine similarity, and save the mapping consumed by the data
pipeline (``--i2tfile`` of ``scripts/train.py``).

Demo: ``python scripts/view_select.py --synthetic --tiny --out /tmp/i2t.json``
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bridgeqa_tpu.models.blip_itm import BLIPITM, BlipITMConfig
from bridgeqa_tpu.models.med import MedConfig
from bridgeqa_tpu.tools.compose_decl import RuleBasedComposer, compose_declarations
from bridgeqa_tpu.tools.view_select import save_i2tfile, select_best_views
from scripts import common


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--split", type=str, nargs="+", default=["train", "val"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--image_size", type=int, default=384)
    p.add_argument("--image_batch", type=int, default=64)
    p.add_argument("--decl_file", type=str, default=None,
                   help="question_id->declaration json (LLM rewrites); "
                        "defaults to the rule-based composer")
    p.add_argument("--itm_ckpt", type=str, default=None,
                   help="torch BLIP-ITM .pth to convert and load")
    p.add_argument("--out", type=str, required=True)
    return p.parse_args(argv)


def build_model(args):
    if args.tiny:
        med = MedConfig(vocab_size=200, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=128,
                        max_position_embeddings=64, encoder_width=64)
        cfg = BlipITMConfig(med=med, image_size=32, vit="custom", embed_dim=32,
                            vit_custom_embed_dim=64, vit_custom_depth=2, vit_custom_heads=4)
    else:
        cfg = BlipITMConfig(image_size=args.image_size, vit="large"
                            if args.itm_ckpt and "large" in args.itm_ckpt else "base")
    model = BLIPITM(cfg)

    ids = np.ones((1, 8), np.int32)
    img = np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, ids, method=model.init_all)

    if args.itm_ckpt:
        from bridgeqa_tpu.utils.blip_checkpoint import (
            convert_vit, convert_bert_encoder, load_torch_checkpoint, merge_pretrained,
            _bert_embeddings, _linear,
        )

        sd = load_torch_checkpoint(args.itm_ckpt)
        num_patches = (cfg.image_size // 16) ** 2
        converted = {
            "visual_encoder": convert_vit(sd, "visual_encoder", num_patches),
            "text_encoder": {
                "embeddings": _bert_embeddings(sd, "text_encoder.bert.embeddings"
                                               if "text_encoder.bert.embeddings.word_embeddings.weight" in sd
                                               else "text_encoder.embeddings", cfg.med.vocab_size),
                "encoder": convert_bert_encoder(sd, "text_encoder.bert.encoder"
                                                if "text_encoder.bert.encoder.layer.0.attention.self.query.weight" in sd
                                                else "text_encoder.encoder", twin=False),
            },
            "vision_proj": _linear(sd, "vision_proj"),
            "text_proj": _linear(sd, "text_proj"),
            "itm_head": _linear(sd, "itm_head"),
        }
        params, loaded, skipped = merge_pretrained(variables["params"], converted)
        print(f"loaded {len(loaded)} tensors, skipped {len(skipped)}")
        variables = {"params": params}
    return model, variables, cfg


def synthetic_frames(image_size: int):
    def load(scene_id):
        rng = np.random.RandomState(abs(hash(scene_id)) % (2 ** 31))
        n = 6
        names = [f"{i * 20}.jpg" for i in range(n)]
        return names, rng.rand(n, image_size, image_size, 3).astype(np.float32)

    return load


def real_frames(data_root, image_size):
    from bridgeqa_tpu.data.views import SceneViewsPool, preprocess_vqa

    pool = SceneViewsPool(os.path.join(data_root, "frames_square"), image_size)

    def load(scene_id):
        from PIL import Image

        names = pool.get_all_views(scene_id)
        images = []
        for name in names:
            color_p, _, _ = pool._paths(scene_id, name)
            images.append(preprocess_vqa(Image.open(color_p), image_size))
        return names, np.stack(images)

    return load


def main(argv=None):
    args = parse_args(argv)
    if args.synthetic or not args.data_root:
        records = common.synthetic_records(8)
        tokenizer = common.synthetic_tokenizer()
        loader = synthetic_frames(32 if args.tiny else args.image_size)
    else:
        records = []
        for s in args.split:
            records += common.load_scanqa_records(args.data_root, s, getattr(args, "dataset", "scanqa"))
        from bridgeqa_tpu.data.tokenization import WordPieceTokenizer

        tokenizer = WordPieceTokenizer.from_vocab_file(os.path.join(args.data_root, "vocab.txt"))
        loader = real_frames(args.data_root, args.image_size)

    if args.decl_file and os.path.exists(args.decl_file):
        import json

        with open(args.decl_file) as f:
            decl_map = json.load(f)
    else:
        decl_map = compose_declarations(records, args.out + ".decl.json",
                                        composer=RuleBasedComposer())

    model, variables, cfg = build_model(args)
    i2t = select_best_views(model, variables, records, tokenizer, loader,
                            decl_map=decl_map, image_batch=args.image_batch)
    save_i2tfile(i2t, args.out)
    print(f"wrote view rankings for {len(i2t['view'])} questions -> {args.out}")
    return i2t


if __name__ == "__main__":
    main()
