from tpu80211.pipeline import rx, sc

__all__ = ["rx", "sc"]
