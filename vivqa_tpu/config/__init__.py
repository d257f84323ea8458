from vivqa_tpu.config.base import ConfigBase, merge_cli_overrides

__all__ = ["ConfigBase", "merge_cli_overrides"]
