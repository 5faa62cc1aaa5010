from setuptools import setup, find_packages

setup(
    name="pcp_tpu",
    version="0.1.0",
    description="TPU-native framework for practical collaborative (V2X) 3D object detection",
    packages=find_packages(exclude=["tests", "tools", "workspace"]),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy", "pyyaml"],
)
