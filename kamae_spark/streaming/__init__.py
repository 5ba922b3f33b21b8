from kamae_spark.streaming.sessions import stream_sessionize, stream_turn_counter

__all__ = ["stream_sessionize", "stream_turn_counter"]
