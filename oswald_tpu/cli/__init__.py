from oswald_tpu.cli.main import main

__all__ = ["main"]
