"""tf.keras oracle: rebuild the reference architecture and load our pytree.

Used to validate the JAX model math + the `.h5` importer against an
independent implementation of the same graph (Keras 3 with an explicit
Keras-2-style hard_sigmoid, since Keras 3 changed the definition).
"""

from __future__ import annotations

import numpy as np


def build_keras_reviser(params: dict, window: int, n_classes: int):
    import keras
    import tensorflow as tf
    from keras import layers as L

    @keras.saving.register_keras_serializable(package="nanorev_test")
    def hard_sig(x):
        return tf.clip_by_value(0.2 * x + 0.5, 0.0, 1.0)

    sig_in = keras.Input((window, 50, 1))
    read_in = keras.Input((window, 6))

    def conv_bn(x, name):
        x = L.TimeDistributed(
            L.Conv1D(8, 3, padding="same", activation="relu"), name=name + "_conv"
        )(x)
        x = L.TimeDistributed(L.BatchNormalization(), name=name + "_bn")(x)
        return x

    x = conv_bn(sig_in, "c1")
    x = conv_bn(x, "c2")
    x = L.Add()([x, sig_in])
    x = L.TimeDistributed(L.Flatten())(x)
    sig_out = L.TimeDistributed(L.Dense(64), name="sig_dense")(x)

    def bil(x, units, name):
        return L.Bidirectional(
            L.LSTM(
                units,
                return_sequences=True,
                activation="tanh",
                recurrent_activation=hard_sig,
            ),
            name=name,
        )(x)

    r = bil(read_in, 16, "r1")
    r = L.BatchNormalization(name="bn_r1")(r)
    r = bil(r, 64, "r2")
    r = L.BatchNormalization(name="bn_r2")(r)
    h = L.Concatenate()([r, sig_out])
    h = bil(h, 128, "t1")
    h = L.BatchNormalization(name="bn_t1")(h)
    h = bil(h, 64, "t2")
    h = L.Dense(128, activation="relu", name="dense1")(h)
    h = L.Dense(32, activation="relu", name="dense2")(h)
    m = L.Dense(6, activation="relu", name="main_out")(h)
    f = L.Flatten()(m)
    f = L.Dense(16, activation="relu", name="feature")(f)
    out = L.Dense(n_classes, activation="softmax", name="final_out")(f)
    model = keras.Model([sig_in, read_in], out)

    arr = np.asarray
    bn_keys = ["gamma", "beta", "mean", "var"]
    for lname, slot, keys in [
        ("c1_conv", "conv1", ["w", "b"]),
        ("c1_bn", "bn_c1", bn_keys),
        ("c2_conv", "conv2", ["w", "b"]),
        ("c2_bn", "bn_c2", bn_keys),
        ("sig_dense", "sig_dense", ["w", "b"]),
        ("bn_r1", "bn_r1", bn_keys),
        ("bn_r2", "bn_r2", bn_keys),
        ("bn_t1", "bn_t1", bn_keys),
        ("dense1", "dense1", ["w", "b"]),
        ("dense2", "dense2", ["w", "b"]),
        ("main_out", "main_out", ["w", "b"]),
        ("feature", "feature", ["w", "b"]),
        ("final_out", "final_out", ["w", "b"]),
    ]:
        model.get_layer(lname).set_weights([arr(params[slot][k]) for k in keys])
    for lname, slot in [
        ("r1", "read_rnn1"),
        ("r2", "read_rnn2"),
        ("t1", "total_rnn1"),
        ("t2", "total_rnn2"),
    ]:
        p = params[slot]
        model.get_layer(lname).set_weights(
            [
                arr(p["fwd"]["wi"]), arr(p["fwd"]["wh"]), arr(p["fwd"]["b"]),
                arr(p["bwd"]["wi"]), arr(p["bwd"]["wh"]), arr(p["bwd"]["b"]),
            ]
        )
    return model
