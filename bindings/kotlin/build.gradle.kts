plugins {
    kotlin("jvm") version "1.9.22"
    id("com.google.protobuf") version "0.9.4"
}

repositories { mavenCentral() }

val grpcVersion = "1.61.0"
val protobufVersion = "3.25.1"

dependencies {
    implementation("io.grpc:grpc-netty-shaded:$grpcVersion")
    implementation("io.grpc:grpc-protobuf:$grpcVersion")
    implementation("io.grpc:grpc-stub:$grpcVersion")
    implementation("io.grpc:grpc-services:$grpcVersion") // health proto
    implementation("com.google.protobuf:protobuf-java:$protobufVersion")
    testImplementation(kotlin("test"))
}

protobuf {
    protoc { artifact = "com.google.protobuf:protoc:$protobufVersion" }
    // message classes only — MarieClient builds its MethodDescriptors by
    // hand against the service paths in marie.proto, so no grpc codegen
}

kotlin { jvmToolchain(17) }
