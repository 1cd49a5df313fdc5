from setuptools import find_packages, setup

setup(
    name="mupe_tpu",
    version="0.1.0",
    description="TPU-native multi-UAV pursuit-evasion RL framework (JAX/XLA/Pallas)",
    packages=find_packages(include=["mupe_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy"],
)
