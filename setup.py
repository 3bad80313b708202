from setuptools import find_packages, setup

setup(
    name="confignet-tpu",
    version="0.1.0",
    description="TPU-native framework for controllable neural face image generation (CONFIG)",
    packages=find_packages(include=["confignet_tpu", "confignet_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
    ],
    extras_require={
        "full": ["opencv-python", "matplotlib", "scipy", "h5py"],
    },
)
