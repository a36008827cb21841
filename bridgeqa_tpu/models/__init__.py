"""Model zoo: VoteNet detector, BLIP branch (ViT + twin med-BERT), fusion/QA."""
