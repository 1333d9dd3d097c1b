rootProject.name = "marie-tpu-client"
