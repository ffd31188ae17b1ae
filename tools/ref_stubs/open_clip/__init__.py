"""open_clip stub: satisfies `import open_clip` in the reference's
embedder.py so golden dumps can import video_to_video.modules. The functions
raise if actually called — goldens for the CLIP tower are generated against a
randomly-initialized HF CLIPTextModel instead (tools/golden_dump.py)."""


def create_model_and_transforms(*args, **kwargs):
    raise RuntimeError('open_clip stub: model creation unavailable in-image')


def tokenize(*args, **kwargs):
    raise RuntimeError('open_clip stub: tokenizer unavailable in-image')
