"""Repo-root training entry point, matching the reference's
``python train.py --training_config cfg.yml ...`` invocation. Delegates to
openwakeword_tpu.train_cli (see examples/custom_model.yml for the config
schema)."""

from openwakeword_tpu.train_cli import main

if __name__ == "__main__":
    import logging
    logging.basicConfig(level=logging.INFO)
    main()
