"""Column-level helpers and pure-Python codecs (TFRecord framing,
tf.train.Example protobuf, image byte helpers)."""
