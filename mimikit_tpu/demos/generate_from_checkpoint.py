"""Interactive generate-from-checkpoint notebook entry
(reference ``demos/generate_from_checkpoint.py``)."""


def demo(root_dir="./"):
    import mimikit_tpu as mmk

    return mmk.GenerateFromCheckpointView(root_dir=root_dir)
